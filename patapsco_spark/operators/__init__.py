"""Engine operators: index build, retrieval, dedup, ANN, eval."""
