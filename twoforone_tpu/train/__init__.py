from twoforone_tpu.train.ema import EMAConfig, ema_update, init_ema  # noqa: F401
from twoforone_tpu.train.trainer import Trainer, TrainState  # noqa: F401
