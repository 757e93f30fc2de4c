from .train_step import (TrainState, create_train_state, lr_schedule,
                         make_optimizer, make_sharded_train_step,
                         make_train_step, trainable_mask)
