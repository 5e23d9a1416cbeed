"""Data pipeline: fixed-shape, mask-padded batches (replaces the
reference's host-side ``utils/*dataset*.py`` + prep scripts)."""

from gspn_tpu.data import synthetic
from gspn_tpu.data.instances import gather_seed_instances

__all__ = ["gather_seed_instances", "synthetic"]
