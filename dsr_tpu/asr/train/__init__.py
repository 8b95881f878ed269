"""Training: ML (Viterbi/Baum-Welch) accumulation and estimation."""
