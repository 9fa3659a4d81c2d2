from cokriging_tpu.predict.iterative import IterativeJointPredictor  # noqa: F401
from cokriging_tpu.predict.joint import JointPredictor  # noqa: F401
from cokriging_tpu.predict.local import LocalPredictor  # noqa: F401
