"""Functional map state, covisibility, keyframe database, vocabulary."""
