"""Kernel-layer ops: RNG, BRDF sampling, environment fallback, tracer,
denoisers, accumulation. One module per reference pass/header (SURVEY.md §2)."""
