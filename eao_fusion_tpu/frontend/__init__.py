"""Perception front end: ORB extraction, matching, object detection lane."""
