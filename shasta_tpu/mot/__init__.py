"""Classical 3D-MOT library (SimpleTrack-fork equivalent of mot_3d/).

Supports the oracle ablations and NMS preprocessing paths of the reference
(mot_3d/mot.py, mot_oracle_dets.py, mot_oracle_kf.py). Host-side numpy with
the vectorized rotated-box geometry from shasta_tpu.core underneath.
"""
from .bbox import MotBBox  # noqa: F401
from .covariance import NuCovariance  # noqa: F401
from .kalman import KalmanFilterMotionModel  # noqa: F401
from .hit_manager import HitManager  # noqa: F401
from .tracklet import Tracklet  # noqa: F401
from .association import associate_dets_to_tracks  # noqa: F401
from .mot_model import MOTModel, FrameData, UpdateInfoData  # noqa: F401
from .validity import Validity  # noqa: F401
