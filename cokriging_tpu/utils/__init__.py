from cokriging_tpu.utils import config  # noqa: F401
