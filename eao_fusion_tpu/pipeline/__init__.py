"""SLAM pipeline stages: tracking, local mapping, loop closing, system facade."""
