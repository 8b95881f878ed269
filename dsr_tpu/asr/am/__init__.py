"""Acoustic models: diagonal GMM codebooks (and Conformer in models/)."""
