from .trainer import (
    TrainState,
    Trainer,
    bn_momentum_schedule,
    lr_schedule,
    make_optimizer,
    summarize_losses,
)

__all__ = ["TrainState", "Trainer", "bn_momentum_schedule", "lr_schedule",
           "make_optimizer", "summarize_losses"]
