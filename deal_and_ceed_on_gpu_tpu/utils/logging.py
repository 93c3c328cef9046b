"""Process-0 logging (reference ``ConditionalOStream``, ``bp5/step-64.cu:325``)."""

from __future__ import annotations

import jax

__all__ = ["rank0_print", "pcout0"]


def rank0_print(*args, **kwargs):
    if jax.process_index() == 0:
        print(*args, **kwargs)


pcout0 = rank0_print
