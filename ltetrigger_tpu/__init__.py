"""ltetrigger_tpu: a TPU-native LTE cell-sensing framework.

A from-scratch re-design of the capabilities of NTIA/gr-ltetrigger for
JAX/XLA/Pallas on TPU: PSS/SSS synchronization, PBCH/MIB decode, tracked-cell
store, CLI, and multi-chip scaling — with the reference's thread-per-block
GNU Radio graph replaced by fixed-shape batched array programs.

Layers (bottom-up):
  ltecore/   pure LTE signal math (numpy constants + host reference receiver)
  ops/       jitted TPU kernels (correlators, OFDM, chest, Viterbi, resampler)
  models/    the flagship "downlink trigger" detection pipeline (lax.scan)
  parallel/  mesh / shard_map multi-channel + multi-chip scaling
  runtime/   host streaming driver, cellstore, IO frontends (incl. native C++)
  apps/      cell_search_file-compatible CLI
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache():
    """Persist XLA compilations across processes.

    TPU compiles in this environment go through a remote-compile tunnel and
    cost minutes; the on-disk cache turns every repeat invocation (tests,
    CLI, bench, driver checks) into a cache hit.  Safe no-op off-TPU.
    """
    if _os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # XLA:CPU AOT cache entries target ISA extensions the execution
        # host may lack (observed SIGSEGV reloading them on this fleet);
        # CPU compiles are cheap — skip persistent caching off-TPU.
        return
    cache = _os.environ.get("LTETRIGGER_COMPILE_CACHE",
                            _os.path.join(_os.path.dirname(__file__),
                                          _os.pardir, ".jax_cache"))
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          _os.path.abspath(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()

from .ltecore import constants  # noqa: F401,E402


def __getattr__(name):
    # Lazy imports keep `import ltetrigger_tpu` fast and jax-optional for
    # pure-numpy users of ltecore.
    if name in ("search", "Trigger"):
        from .models import api
        return getattr(api, name)
    if name == "MultiTrigger":
        from .models.multi import MultiTrigger
        return MultiTrigger
    if name == "WidebandTrigger":
        from .models.wideband import WidebandTrigger
        return WidebandTrigger
    if name == "CellStore":
        from .runtime.cellstore import CellStore
        return CellStore
    raise AttributeError(name)
