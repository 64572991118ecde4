"""Evaluation suite (SURVEY C15/C16): frame metrics live in
``training.metrics``; this package holds the musical pianoroll-quality
statistics and the evaluation drivers."""

from multinn_tpu.eval import musical  # noqa: F401
