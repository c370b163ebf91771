"""Training stack: configs, optimizers, sharded train/eval steps, checkpoints."""
