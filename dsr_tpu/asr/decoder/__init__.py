"""Decoders: dense Viterbi (small graphs) and batched WFST token passing."""
