"""Numeric/OOB guards for the jitted engine steps (jax.experimental.checkify).

The reference relies on torch's eager NaN surfacing plus cudnn determinism
(reference: eval/run_longbench.py:78-85); under jit XLA silently propagates
NaN/Inf into garbage tokens instead. With EngineConfig.debug_checks the
prefill/generate programs run under checkify float+index instrumentation and
raise JaxRuntimeError at the first NaN/Inf-producing op or out-of-bounds
index — at a tracing/runtime cost, so it is a debug flag, not the default.
(SURVEY.md §5 sanitizers row.)
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import checkify

ERRORS = checkify.float_checks | checkify.index_checks


def checked_jit(fn, **jit_kw):
    """jit(checkify(fn)) that re-raises the first instrumented error.

    Drop-in for jax.jit(fn, **jit_kw) at engine factory sites: the wrapper
    calls checkify.check_error on every invocation, so a NaN produced deep in
    a scanned layer surfaces as a Python exception with the failing op's
    location instead of propagating into the logits.
    """
    inner = jax.jit(checkify.checkify(fn, errors=ERRORS), **jit_kw)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = inner(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper
