import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _base import *  # noqa: F401,F403

det_type = ["trailer"]
max_objects = 60
fp_ratio = 1 / 2
dead_trk_ratio = 1 / 2
beta = 0.4

model = dict(model, max_obj=max_objects)  # noqa: F405
