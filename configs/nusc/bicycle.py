import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _base import *  # noqa: F401,F403

det_type = ["bicycle"]
max_objects = 50
fp_ratio = 1 / 3
dead_trk_ratio = 1 / 3
beta = 0.4

model = dict(model, max_obj=max_objects)  # noqa: F405
