from controlvar_tpu.utils.misc import seed_everything, SmoothedValue, MetricLogger  # noqa: F401
from controlvar_tpu.utils.tracker import Tracker  # noqa: F401
