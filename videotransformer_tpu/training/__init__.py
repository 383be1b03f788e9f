"""Training harness: optimizer builders, schedules, pjit train loop, metrics,
checkpointing. Replaces the reference's PyTorch-Lightning stack (SURVEY §2.1
#2/#3/#14) with a functional JAX design over a device mesh."""
