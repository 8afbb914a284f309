"""Host utilities: profiling spans, offline visualization."""
