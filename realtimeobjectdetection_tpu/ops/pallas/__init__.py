# Pallas TPU kernels for the hot ops (filled in as profiling justifies).
