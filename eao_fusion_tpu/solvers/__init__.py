"""Batched Gauss-Newton / Levenberg-Marquardt solvers for SLAM factor graphs."""
