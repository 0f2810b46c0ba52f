from twoforone_tpu.utils.config import TrainConfig, load_legacy_args_pickle  # noqa: F401
