"""Runtime utilities: checkpointing, experiment dirs, logging, visualisation."""
