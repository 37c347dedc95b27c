"""Solver settings.

Defaults replicate the reference (EiCOS::Settings,
/root/reference/include/eicos.hpp:23-47).  Unlike the reference, where most
fields are ``const`` and effectively compile-time, this is a frozen, hashable
dataclass passed to jit as a *static* argument: changing a setting recompiles,
keeping every tolerance a literal inside the compiled program (XLA constant
folds the exit tests).

Fields absent from the reference:
  * ``kkt_strategy`` — "full" factors the (n+p+m) quasidefinite KKT matrix
    (the analogue of the reference's expanded sparse LDL^T,
    /root/reference/src/eicos.cpp:1734-1890); "reduced" eliminates exactly
    the diagonal LP cone block (factors ms+n+p, certificate-complete — the
    speed path with full exit-code parity); "normal" also eliminates SOC
    blocks via the closed-form (W^2+dI)^{-1} (factors n+p, fastest for
    batches of interior SOCPs, but squares the cone conditioning — not
    certificate-safe near SOC infeasibility); "banded" is "normal" +
    RCM-permuted block-banded factorization (see kkt.py).  All recover
    accuracy by iterative refinement against the full operator.
  * ``factor_dtype`` — precision of the LDL^T factorization; residuals and
    refinement always run in float64.  float32 factorization rides the TPU
    MXU at full speed and is corrected by refinement.
"""

import dataclasses


@dataclasses.dataclass(frozen=True)
class Settings:
    gamma: float = 0.99          # scaling of the final step length
    delta: float = 2e-7          # (unused in reference; kept for parity)
    deltastat: float = 7e-8      # static regularization
    eps: float = 1e13            # regularization threshold (unused in ref)
    feastol: float = 1e-8        # primal/dual infeasibility tolerance
    abstol: float = 1e-8         # absolute tolerance on duality gap
    reltol: float = 1e-8         # relative tolerance on duality gap
    feastol_inacc: float = 1e-4  # relaxed infeasibility tolerance
    abstol_inacc: float = 5e-5   # relaxed absolute gap tolerance
    reltol_inacc: float = 5e-5   # relaxed relative gap tolerance
    nitref: int = 9              # max iterative refinement steps
    maxit: int = 100             # (alias of iter_max in reference)
    linsysacc: float = 1e-14     # relative accuracy of search direction
    irerrfact: float = 6.0       # required IR error reduction factor
    stepmin: float = 1e-6        # smallest admissible step
    stepmax: float = 0.999       # largest admissible step
    sigmamin: float = 1e-4       # always do some centering
    sigmamax: float = 1.0        # never fully center
    equil_iters: int = 3         # equilibration iterations
    iter_max: int = 100          # maximum IPM iterations
    safeguard: float = 500.0     # max PRES increase before NUMERICS

    # TPU-native additions
    kkt_strategy: str = "full"   # "full" | "reduced" | "normal" | "banded"
    factor_dtype: str = "float64"  # "float64" | "float32"
    block: int = 128             # LDL^T block size (MXU tile)
    # stream the iteration table DURING the solve via jax.debug.callback
    # (the reference's verbose mode prints live, src/eicos.cpp:733-753);
    # off by default so the hot path stays sync-free
    verbose_live: bool = False
    # fused Pallas kernels for the 128x128 factorization leaves
    # ("auto" | "on" | "off"), TPU only.  float64 factors use the
    # double-single kernel (ops/pallas_leaf_ds.py): one launch replaces
    # the ~128x8 microscopic XLA ops per leaf that otherwise dominate
    # the whole IPM iteration (measured — see CLAUDE.md perf notes),
    # at ~2^-48 effective precision polished by float64 refinement.
    # float32 factors use the plain kernel (ops/pallas_leaf.py).
    pallas_leaf: str = "auto"
    # dtype of the banded strategy's off-diagonal/Schur/solve block
    # products ("float64" | "float32").  float64 matmuls at (128,128)
    # sizes lower to chunked while-loops with ~300us overhead each on
    # v5e; "float32" runs them on the MXU at "highest" precision
    # (~7e-7 relative), absorbed by float64 refinement.  Leaf
    # factorizations stay double-single regardless.
    band_gemm: str = "float64"
    # storage of the banded factor's prechunked solve operands
    # ("bf16" | "i8").  The refinement solves are HBM-stream-bound;
    # "i8" stores the chunk decompositions as 7-bit-grid int8 integers
    # (8 B/element vs bf16's 14 — same exact-product arithmetic after
    # an exact in-kernel convert; see ops/pallas_band_ds.py's int8
    # header note).  Affects rounding at ~2^-49: lane-level exit flips
    # are absorbed by the exit-time f64 recheck + rescue protocol.
    chunk_store: str = "bf16"
    # dense-path (reduced/normal/full) float64 solve engine on TPU:
    # "auto" = in-kernel blocked SUBSTITUTION against the prechunked
    # triangular factor (ops/pallas_dense_ds — streams the triangle
    # once per pass, lane-tiles under vmap); "inverse" = the explicit
    # L^{-1} two-GEMM solves (the pre-round-5 path, kept for A/B and
    # as the off-TPU fallback).  "subst" forces the kernel path (it
    # still requires a TPU backend to take effect).
    dense_solve: str = "auto"

    def __post_init__(self):
        # Fail loudly on misconfiguration: downstream dispatch compares
        # string equality (kkt.py checks chunk_store == "i8"), so a typo
        # would otherwise silently select a different code path.
        _check = {
            "kkt_strategy": ("full", "reduced", "normal", "banded"),
            "factor_dtype": ("float64", "float32"),
            "pallas_leaf": ("auto", "on", "off"),
            "band_gemm": ("float64", "float32"),
            "chunk_store": ("bf16", "i8"),
            "dense_solve": ("auto", "subst", "inverse"),
        }
        for field, allowed in _check.items():
            value = getattr(self, field)
            if value not in allowed:
                raise ValueError(
                    f"Settings.{field}={value!r} is not one of {allowed}")
