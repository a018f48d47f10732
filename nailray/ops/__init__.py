"""Operator families mirroring the reference's 30 subcommands
(SURVEY §2), each as a Dataset→Dataset (or small-result) function."""

from . import (projection, filtering, sorting, sampling, dedup, combine,  # noqa: F401
               aggregates, analytic)
