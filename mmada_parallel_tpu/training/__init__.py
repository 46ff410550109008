"""Training stack: losses, masking, optimizers, train step, checkpointing."""
