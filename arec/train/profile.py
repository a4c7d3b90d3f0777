"""Profiling hooks (SURVEY.md §5 "Tracing / profiling": absent in the
reference; here jax.profiler traces on demand).

Usage: set AREC_PROFILE_DIR=/path and the Trainer captures a trace of steps
[AREC_PROFILE_START, AREC_PROFILE_START + AREC_PROFILE_STEPS) viewable in
Perfetto / tensorboard-plugin-profile."""

from __future__ import annotations

import os

import jax


class StepProfiler:
    def __init__(self):
        self.dir = os.environ.get("AREC_PROFILE_DIR", "")
        self.start = int(os.environ.get("AREC_PROFILE_START", "10"))
        self.steps = int(os.environ.get("AREC_PROFILE_STEPS", "5"))
        self._active = False

    def on_step(self, step: int) -> None:
        if not self.dir:
            return
        # >= (not ==): with steps_per_dispatch > 1 on_step fires once per
        # K-step chunk, so the exact start step may be skipped over
        if not self._active and self.start <= step < self.start + self.steps:
            jax.profiler.start_trace(self.dir)
            self._active = True
        elif self._active and step >= self.start + self.steps:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
