"""Datasets, trajectory IO, evaluation, checkpointing."""
