"""Scalar / vectorized helper functions (reference operators F1-F8) and the
deterministic IE pattern contract shared by the pipeline stages and the
reference-semantics oracle."""
