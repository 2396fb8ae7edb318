"""Runtime utilities: framebuffer/image IO, timing, checkpointing, AOV
display modes, debug drawing and profiling."""
