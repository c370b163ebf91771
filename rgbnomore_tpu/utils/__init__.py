"""Shared utilities: windowed metrics, logging helpers."""

from rgbnomore_tpu.utils.metrics import LocalWindow
