from .optim import build_optimizer, lr_schedule  # noqa: F401
from .state import TrainState, create_train_state  # noqa: F401
from .step import ScheduleWeights, build_train_step, img2mse, mse2psnr  # noqa: F401
