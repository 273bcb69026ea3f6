"""Host-side utilities: image prep, timers, checkpointing, visualization."""
