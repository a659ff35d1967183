"""Global configuration for iifea_tpu.

The reference's knob surface (DOLFIN ``parameters[...]``, PETSc options DB,
per-demo argparse — see SURVEY.md §5 "Config / flag system") is consolidated
here into one module-level config plus per-problem dataclasses in the demos.
"""
from __future__ import annotations

import dataclasses
import os

import jax

_CONFIGURED = False
_AUTO_PLATFORM_DECIDED = False


def setup(enable_x64: bool = True) -> None:
    """Initialise JAX for immersed-FEA workloads.

    Double precision is the default because the reference's numerics
    (Nitsche penalties up to h^-3, basis-function-removal tolerances of 1e-9,
    KSP rtol 1e-8 — common.py:509-641) are meaningless in f32. On TPU f64 is
    emulated; performance-critical paths (bench.py) opt into mixed precision
    explicitly via ``dtype=...`` arguments instead of flipping this switch.
    """
    global _CONFIGURED
    if _CONFIGURED:
        return
    jax.config.update("jax_enable_x64", bool(enable_x64))
    # escape hatch: the axon sitecustomize pins jax_platforms to the TPU
    # plugin; IIFEA_PLATFORM=cpu forces host execution (used by tests/dev).
    plat = os.environ.get("IIFEA_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    # persistent compile cache: first contact with a demo on the TPU pays
    # minutes of remote compiles; cached reruns start in seconds. Off with
    # IIFEA_NO_COMPILE_CACHE=1.
    if not os.environ.get("IIFEA_NO_COMPILE_CACHE"):
        # namespace by host + CPU features + requested platform: XLA:CPU
        # persists AOT executables specialized to the compiling machine's
        # CPU features, and loading them on a different host risks SIGILL
        # (the nodename alone is stable across VM reschedules onto
        # different-featured hosts — observed as cpu_aot_loader feature-
        # mismatch warnings)
        cpu_tag = ""
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        import hashlib

                        cpu_tag = "-" + hashlib.sha1(
                            line.encode()
                        ).hexdigest()[:8]
                        break
        except OSError:
            pass
        tag = f"{os.uname().nodename}{cpu_tag}-{plat or 'default'}"
        cache = os.environ.get(
            "IIFEA_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache", tag),
        )
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # at process exit, report which backend actually executed (demos can be
    # auto-routed to host, or the TPU tunnel may be down): subprocess-level
    # tooling (tools/run_studies.py) scrapes this marker so studies rows
    # record the real platform, not the requested one
    import atexit

    def _report_effective_platform():
        # NOTE: must only report backends that are ALREADY initialized —
        # jax.devices()/local_devices() would initialize the default (axon)
        # backend here at exit, which HANGS when the tunnel is wedged. The
        # private map is the only side-effect-free view; if a JAX upgrade
        # removes it, say so out loud instead of silently dropping the
        # marker (run_studies would otherwise label rows 'unknown').
        try:
            import jax._src.xla_bridge as xb

            plats = sorted({d.platform for b in xb._backends.values()
                            for d in b.local_devices()})
        except Exception as e:
            print("[iifea_tpu] effective platform: unknown "
                  f"(backend introspection failed: {type(e).__name__})")
            return
        if plats:
            print(f"[iifea_tpu] effective platform: {','.join(plats)}")

    atexit.register(_report_effective_platform)
    _CONFIGURED = True


def auto_platform(n_cells: int, threshold: int = 200_000) -> None:
    """Route small problems to the host CPU when nothing was forced.

    First contact with a demo on the axon TPU pays minutes of remote
    compiles through the tunnel; problems under ``threshold`` cells finish
    in seconds on the host (VERDICT r1 'demo latency' finding). Only
    applies when (a) the user did not force IIFEA_PLATFORM, (b) the axon
    plugin is the default platform, and (c) no JAX backend has been
    initialized yet. Disable with IIFEA_NO_AUTO_HOST=1.
    """
    global _AUTO_PLATFORM_DECIDED
    if _AUTO_PLATFORM_DECIDED:
        # only the FIRST mesh of the process decides: a later read of a
        # small auxiliary mesh must not reroute a large job to the host
        return
    _AUTO_PLATFORM_DECIDED = True
    if os.environ.get("IIFEA_PLATFORM") or os.environ.get(
        "IIFEA_NO_AUTO_HOST"
    ):
        return
    if n_cells >= threshold:
        return
    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return
    try:
        import jax._src.xla_bridge as xb

        if xb._backends:        # too late: a backend already initialized
            return
    except Exception:
        pass
    jax.config.update("jax_platforms", "cpu")
    # visible to subprocess-level tooling (e.g. studies platform labels)
    os.environ["IIFEA_PLATFORM_EFFECTIVE"] = "cpu(auto)"
    print(
        f"[iifea_tpu] small problem ({n_cells} cells < {threshold}): "
        "running on host CPU (set IIFEA_NO_AUTO_HOST=1 or "
        "IIFEA_PLATFORM=<p> to override)"
    )


@dataclasses.dataclass
class SolverConfig:
    """Mirrors the reference's linear-solve knobs (common.py:509-641).

    method: 'cg' | 'gmres' (FGMRES) | 'gcr' | 'bicgstab' | 'direct'
        ('direct' provides the 'mumps' role: sparse LU, executed on host —
        there is no sparse direct factorization on TPU; see SURVEY.md §2.3 N5.)
    pc: 'jacobi' | 'none' | 'bjacobi'
    """

    method: str = "gmres"
    pc: str = "jacobi"
    rtol: float = 1e-8
    atol: float = 1e-9
    max_it: int = 100000
    gmres_restart: int = 300
    bfr_tol: float | None = None  # basis-function removal (trimNodes) tolerance
    monitor: bool = True


def default_device_count() -> int:
    return int(os.environ.get("IIFEA_DEVICES", len(jax.devices())))
