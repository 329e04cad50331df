from mocopci_tpu.training.checkpoint import CheckpointManager
from mocopci_tpu.training.loop import (
    TrainState,
    create_train_state,
    eval_step,
    make_optimizer,
    make_sharded_train_step,
    train_step,
)
from mocopci_tpu.training.loss import gt_pyramid, mocopci_loss
from mocopci_tpu.training.schedule import make_lr_schedule
