"""Core numeric ops: Lie groups, image kernels, features, matching, RANSAC."""
