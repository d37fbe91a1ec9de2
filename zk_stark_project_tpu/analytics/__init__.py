"""Benchmark & analytics harnesses (reference SURVEY.md §1/L8): unified
time/memory harness, batch sweep automation, per-step profiler, MiMC
microbench, per-round FL recorder, plot suite."""

from .recorder import Analytics

__all__ = ["Analytics"]
