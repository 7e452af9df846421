from .decision import apply_decision_rules  # noqa: F401
from .greedy import greedy_assign_np, greedy_assign_jax  # noqa: F401
from .pub_tracker import PubTracker, NUSCENES_TRACKING_NAMES  # noqa: F401
