"""ASR half of the framework: acoustic models, graphs, decoders, training."""
