"""TPU-native DSP / feature / model ops (JAX/XLA, Pallas for hot loops)."""
