"""Version-targeted workarounds for upstream JAX bugs.

JAX 0.9.0: C++ pjit fastpath cache corruption under interpret-mode Pallas
-------------------------------------------------------------------------
Interpret-mode ``pl.pallas_call`` (the CPU test path) executes the kernel
jaxpr op-by-op, dispatching thousands of short-lived inner jits through
``jit_p.bind`` -> ``_pjit_call_impl``, whose C++ dispatch cache is keyed
on transient function objects (``_get_jaxpr_as_fun`` builds a fresh lambda
per miss; the pjit source carries ``TODO(necula): remove num_const_args
when fixing the C++ path``).  Observed failure mode (deterministic):
jit(grad(...)) over a scan containing interpret-mode Pallas calls runs
correctly the FIRST time, then every later call dies at dispatch with

    INVALID_ARGUMENT: Execution supplied N buffers but compiled program
    expected M buffers

because the function's C++ fastpath entry now points at a different
executable (id-reuse collision among the interpreter's transient inner
functions).  Verified minimal trigger in this repo: render + jitted
train-step through the cluster engine on CPU; disappears entirely when
``_get_fastpath_data`` is made to return None (= "don't populate the C++
cache"), which only costs the ~100us Python dispatch path.

``disable_cpp_fastpath_caching()`` applies that blanket opt-out.  It is
invoked lazily by ``ops.cluster_trace`` the first time an interpret-mode
kernel is about to be built, so real-TPU runs (no interpreter) keep the
full-speed C++ dispatch.  jax 0.9.x only; later versions are expected to
fix the C++ const/dispatch path per the upstream TODO.
"""

from __future__ import annotations

import jax

_disabled = False


def disable_cpp_fastpath_caching() -> None:
    """Idempotently stop populating the C++ pjit fastpath cache."""
    global _disabled
    if _disabled or not jax.__version__.startswith("0.9."):
        return
    try:
        from jax._src import pjit as _pjit

        _pjit._get_fastpath_data = lambda *a, **k: None
        _disabled = True
    except (ImportError, AttributeError):  # internal layout changed: skip
        pass
