from x2gnn_tpu.train.optim import (  # noqa: F401
    warmup_exponential_decay, make_optimizer)
from x2gnn_tpu.train.ema import EmaState, ema_init, ema_update  # noqa: F401
from x2gnn_tpu.train.loss import smooth_l1_loss, masked_mae  # noqa: F401
from x2gnn_tpu.train.trainer import Trainer, TrainState  # noqa: F401
