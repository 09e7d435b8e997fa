from cuahn_vio.train.trainer import (  # noqa: F401
    Batch,
    TrainConfig,
    make_batch,
    make_loss_fn,
    make_train_step,
    sample_pair,
    train,
)
