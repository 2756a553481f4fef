"""Experiment utilities: checkpointing, sweep runner, reporter, profiling."""
