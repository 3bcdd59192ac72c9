"""Parameter search: random search and discrete coordinate descent.

TPU-native equivalent of the reference's training harness
(scripts/dev-scripts): random search over (np, beta_x, beta_t, lambda) at
fixed patch/search sizes (train.sh:40-102), and discrete coordinate
descent over the group-size parameters (train-nn-smoothing.sh:147-288).
The evaluation protocol mirrors nlkalman-train.sh: fixed noise fixtures,
mean PSNR over sequences, measured from a burn-in frame (:43-50) with an
optional border crop (:35).

Results accumulate in the 16-column table format of
scripts/dev-scripts/run-nlk-set.sh:94-96:
sigma f1_nx f1_bx f1_nt f1_ntagg f1_bt f2_nx f2_bx f2_nt f2_ntagg f2_bt
s1_nt s1_bt f1_mse f2_mse s1_mse
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..params import NLKParams, FilterMode, default_params
from ..pipeline import add_noise_sequence, denoise_sequence, sequence_psnr


@dataclasses.dataclass
class TrialResult:
    sigma: float
    p1: NLKParams
    p2: NLKParams
    ps: NLKParams
    mse: dict          # {"flt1": .., "flt2": .., "smo1": ..}
    psnr: dict


def format_table_row(r: TrialResult) -> str:
    """16-column row (run-nlk-set.sh:94-96)."""
    return (
        f"{r.sigma:3.0f} "
        f"{r.p1.npatches_x:3d} {r.p1.beta_x:6.3f} {r.p1.npatches_t:3d} "
        f"{r.p1.npatches_tagg:3d} {r.p1.beta_t:6.3f} "
        f"{r.p2.npatches_x:3d} {r.p2.beta_x:6.3f} {r.p2.npatches_t:3d} "
        f"{r.p2.npatches_tagg:3d} {r.p2.beta_t:6.3f} "
        f"{r.ps.npatches_t:3d} {r.ps.beta_t:6.3f} "
        f"{r.mse['flt1']:9.4f} {r.mse['flt2']:9.4f} {r.mse['smo1']:9.4f}"
    )


def _dyn_split(p: NLKParams):
    """Canonical STATIC key + TRACED scalar dict for one parameter set.

    Group sizes and noise multipliers become runtime scalars so a search
    over them reuses ONE compiled kernel per shape (the point of the
    reference's fixture economy — without this every trial would pay a
    fresh XLA/Mosaic compile)."""
    import jax.numpy as jnp

    key = dataclasses.replace(
        p, npatches_x=1, npatches_t=1, npatches_tagg=1,
        beta_x=0.0, beta_t=0.0,
    )
    dyn = dict(
        np_t=jnp.asarray(p.npatches_t, jnp.int32),
        np_x=jnp.asarray(p.npatches_x, jnp.int32),
        nagg=jnp.asarray(p.npatches_tagg, jnp.int32),
        beta_x=jnp.asarray(p.beta_x, jnp.float32),
        beta_t=jnp.asarray(p.beta_t, jnp.float32),
    )
    return key, dyn


def evaluate(
    clean_seqs,
    sigma: float,
    p1: NLKParams,
    p2: NLKParams,
    ps: NLKParams,
    seeds=None,
    first_frame: int = 10,
    border: int = 10,
    smoothing: bool = True,
    flow_cfg=None,
    smooth_flow_cfg=None,
    fixtures=None,
    dynamic: bool = False,
    flow_dyn: dict | None = None,
    sflow_dyn: dict | None = None,
) -> TrialResult:
    """Mean per-stage MSE/PSNR of one parameter set over clean sequences.

    ``fixtures``: optional list of :class:`..train.fixtures.Fixtures`
    (one per sequence).  When given, the evaluation runs the reference's
    TRAINING protocol — precomputed noise and noisy-frame flow reused
    across trials (nlkalman-train.sh:17-28) — instead of recomputing
    TV-L1 inside every trial.
    """
    import jax.numpy as jnp
    from ..pipeline import FlowConfig

    if flow_cfg is None:
        flow_cfg = FlowConfig()
    if fixtures is not None and (flow_dyn or sflow_dyn):
        raise ValueError(
            "flow_dyn/sflow_dyn have no effect with fixtures (their flow "
            "is precomputed); rebuild fixtures with the new flow "
            "parameters or evaluate without fixtures"
        )
    mses = {"flt1": [], "flt2": [], "smo1": []}
    psnrs = {"flt1": [], "flt2": [], "smo1": []}
    for si, clean in enumerate(clean_seqs):
        t = clean.shape[0]
        seq_seeds = (
            [1000 * si + i for i in range(t)] if seeds is None else seeds[si]
        )
        if fixtures is not None:
            from ..pipeline.sequence import (
                filter_sequence_precomputed, smooth_sequence_precomputed)

            fx = fixtures[si]
            if dynamic:
                k1, d1 = _dyn_split(p1)
                k2, d2 = _dyn_split(p2)
                ks, ds = _dyn_split(ps)
            else:
                k1, d1, k2, d2, ks, ds = p1, None, p2, None, ps, None
            flt1, flt2 = filter_sequence_precomputed(
                jnp.asarray(fx.noisy), jnp.asarray(fx.bflow),
                jnp.asarray(fx.bocc), sigma, k1, k2, dyn1=d1, dyn2=d2,
            )
            smo1 = None
            if smoothing:
                smo1 = smooth_sequence_precomputed(
                    flt2, jnp.asarray(fx.fflow), jnp.asarray(fx.focc),
                    sigma, ks, dyns=ds,
                )
        else:
            noisy = add_noise_sequence(
                np.asarray(clean, np.float32), sigma, seq_seeds
            )
            flt1, flt2, smo1 = denoise_sequence(
                jnp.asarray(noisy), sigma, p1, p2, ps, smoothing=smoothing,
                flow_cfg=flow_cfg, smooth_flow_cfg=smooth_flow_cfg,
                flow_dyn=flow_dyn, sflow_dyn=sflow_dyn,
            )
        ff = min(first_frame, t - 1)
        stacks = {"flt1": np.asarray(flt1), "flt2": np.asarray(flt2)}
        if smo1 is not None:
            stacks["smo1"] = np.asarray(smo1)
        for k, v in stacks.items():
            m = sequence_psnr(clean, v, first_frame=ff, border=border)
            mses[k].append(m["mse"])
            psnrs[k].append(m["psnr"])
    agg_mse = {k: float(np.mean(v)) if v else float("nan") for k, v in mses.items()}
    agg_psnr = {k: float(np.mean(v)) if v else float("nan") for k, v in psnrs.items()}
    return TrialResult(sigma, p1, p2, ps, agg_mse, agg_psnr)


def random_search(
    clean_seqs,
    sigma: float,
    n_trials: int,
    rng=None,
    table_path: str | None = None,
    first_frame: int = 10,
    smoothing: bool = False,
    fixtures=None,
    dynamic: bool | None = None,
    respect_lambda: bool = False,
):
    """Random search a la train.sh:40-102: samples np in [0,99),
    beta_x in [0,8), beta_t in [2,12), lambda in [0,1) at p=8, w=10.

    With fixtures the search defaults to DYNAMIC parameter trials (one
    compiled kernel reused across all trials).  train.sh samples a
    distance lambda but the shipped reference build ignores it
    (K_SIMILAR_PATCHES without LAMBDA_DISTANCE, src/nlkalman.c:686);
    respect_lambda=True exercises our LAMBDA_DISTANCE v2 variant
    instead, at one recompile per trial."""
    if dynamic is None:
        dynamic = fixtures is not None
    if rng is None:
        rng = np.random.default_rng(0)
    results = []
    for _ in range(n_trials):
        npx = int(rng.integers(1, 99))
        bx = float(rng.uniform(0, 8))
        bt = float(rng.uniform(2, 12))
        lam = float(rng.uniform(0, 1))
        base = NLKParams(
            patch_sz=8, search_sz_x=10, search_sz_t=5,
            npatches_x=npx, npatches_t=npx, npatches_tagg=min(npx, 20),
            dista_lambda=lam if respect_lambda else 1.0,
            beta_x=bx, beta_t=bt,
        )
        p2 = default_params(sigma, FilterMode.FLT2)
        ps = default_params(sigma, FilterMode.SMO1)
        r = evaluate(clean_seqs, sigma, base, p2, ps,
                     first_frame=first_frame, smoothing=smoothing,
                     fixtures=fixtures, dynamic=dynamic)
        results.append(r)
        if table_path:
            with open(table_path, "a") as fh:
                fh.write(format_table_row(r) + "\n")
    results.sort(key=lambda r: r.mse["flt2"])
    return results


def coordinate_descent(
    clean_seqs,
    sigma: float,
    fields=("f1_nx", "f1_nt", "f1_ntagg", "f2_nx", "f2_nt", "s1_nt"),
    step: int = 5,
    max_rounds: int = 3,
    objective: str = "smo1",
    first_frame: int = 10,
    table_path: str | None = None,
):
    """Discrete coordinate descent (train-nn-smoothing.sh:147-288): walk
    each group-size field by +-step while the objective MSE improves."""
    p1 = default_params(sigma, FilterMode.FLT1)
    p2 = default_params(sigma, FilterMode.FLT2)
    ps = default_params(sigma, FilterMode.SMO1)

    def get(field, p1, p2, ps):
        obj = {"f1": p1, "f2": p2, "s1": ps}[field[:2]]
        attr = {"nx": "npatches_x", "nt": "npatches_t", "ntagg": "npatches_tagg"}[
            field.split("_")[1]
        ]
        return obj, attr

    def with_field(field, val, p1, p2, ps):
        obj, attr = get(field, p1, p2, ps)
        new = dataclasses.replace(obj, **{attr: max(1, val)})
        return {
            "f1": (new, p2, ps), "f2": (p1, new, ps), "s1": (p1, p2, new)
        }[field[:2]]

    best = evaluate(clean_seqs, sigma, p1, p2, ps, first_frame=first_frame)
    history = [best]
    for _ in range(max_rounds):
        improved = False
        for field in fields:
            for direction in (+1, -1):
                while True:
                    obj, attr = get(field, p1, p2, ps)
                    cand_val = getattr(obj, attr) + direction * step
                    if cand_val < 1:
                        break
                    c1, c2, cs = with_field(field, cand_val, p1, p2, ps)
                    r = evaluate(clean_seqs, sigma, c1, c2, cs,
                                 first_frame=first_frame)
                    history.append(r)
                    if table_path:
                        with open(table_path, "a") as fh:
                            fh.write(format_table_row(r) + "\n")
                    if r.mse[objective] < best.mse[objective]:
                        best = r
                        p1, p2, ps = c1, c2, cs
                        improved = True
                    else:
                        break
        if not improved:
            break
    return best, history


def line_search(
    clean_seqs,
    sigma: float,
    field: str,
    values,
    objective: str = "smo1",
    first_frame: int = 10,
    table_path: str | None = None,
):
    """1-D line search over one beta/group-size field (the
    line-search-smoothing.sh / line-search-filtering-oflow.sh family).
    field: e.g. "f1_bx", "f2_bt", "s1_bt", "f1_nx", "s1_nt"."""
    attr_map = {"nx": "npatches_x", "nt": "npatches_t",
                "ntagg": "npatches_tagg", "bx": "beta_x", "bt": "beta_t"}
    which, key = field.split("_", 1)
    attr = attr_map[key]
    results = []
    for v in values:
        p1 = default_params(sigma, FilterMode.FLT1)
        p2 = default_params(sigma, FilterMode.FLT2)
        ps = default_params(sigma, FilterMode.SMO1)
        tgt = {"f1": p1, "f2": p2, "s1": ps}[which]
        tgt = dataclasses.replace(tgt, **{attr: v})
        p1, p2, ps = {
            "f1": (tgt, p2, ps), "f2": (p1, tgt, ps), "s1": (p1, p2, tgt)
        }[which]
        r = evaluate(clean_seqs, sigma, p1, p2, ps, first_frame=first_frame)
        results.append((v, r))
        if table_path:
            with open(table_path, "a") as fh:
                fh.write(format_table_row(r) + "\n")
    results.sort(key=lambda t: t[1].mse[objective])
    return results


_BETA_ATTR = {"bx": "beta_x", "bt": "beta_t"}


def _with_betas(sigma, betas: dict):
    """Params triple with the given {"f1_bx": v, ...} beta overrides."""
    p1 = default_params(sigma, FilterMode.FLT1)
    p2 = default_params(sigma, FilterMode.FLT2)
    ps = default_params(sigma, FilterMode.SMO1)
    out = {"f1": p1, "f2": p2, "s1": ps}
    for field, v in betas.items():
        which, key = field.split("_", 1)
        out[which] = dataclasses.replace(out[which], **{_BETA_ATTR[key]: v})
    return out["f1"], out["f2"], out["s1"]


def gradient_descent(
    clean_seqs,
    sigma: float,
    fields=("f1_bx", "f1_bt", "f2_bx", "f2_bt", "s1_bt"),
    n_iters: int = 10,
    step: float = 0.05,
    gs: float = 0.01,
    objective: str = "smo1",
    first_frame: int = 10,
    table_path: str | None = None,
):
    """Numerical-gradient descent on the beta parameters, mirroring
    scripts/dev-scripts/train-gd-smoothing.sh: forward-difference gradient
    of the objective MSE (gs step, :125-146) and update x -= step * grad
    (:155-160).  Returns (history, final_betas); history entries are
    TrialResults at the visited points."""
    betas = {}
    p1 = default_params(sigma, FilterMode.FLT1)
    p2 = default_params(sigma, FilterMode.FLT2)
    ps = default_params(sigma, FilterMode.SMO1)
    src = {"f1": p1, "f2": p2, "s1": ps}
    for field in fields:
        which, key = field.split("_", 1)
        betas[field] = float(getattr(src[which], _BETA_ATTR[key]))

    history = []
    for _ in range(n_iters):
        r0 = evaluate(clean_seqs, sigma, *_with_betas(sigma, betas),
                      first_frame=first_frame)
        history.append(r0)
        if table_path:
            with open(table_path, "a") as fh:
                fh.write(format_table_row(r0) + "\n")
        grad = {}
        for field in fields:
            bumped = dict(betas)
            bumped[field] += gs
            rb = evaluate(clean_seqs, sigma, *_with_betas(sigma, bumped),
                          first_frame=first_frame)
            grad[field] = (rb.mse[objective] - r0.mse[objective]) / gs
        for field in fields:
            betas[field] -= step * grad[field]
    return history, betas


def grid_search_2d(
    clean_seqs,
    sigma: float,
    field_a: str,
    values_a,
    field_b: str,
    values_b,
    objective: str = "flt2",
    first_frame: int = 10,
    table_path: str | None = None,
):
    """2-D grid search mirroring
    scripts/dev-scripts/2d-search-filtering-oflow.sh:83-100.

    Fields may be NLK beta/group fields ("f1_bx", "s1_bt", ...) or the
    flow data-weight / occlusion-threshold pairs the reference script
    sweeps: "fflow_lambda"/"fflow_occ" (filtering flow) and
    "sflow_lambda"/"sflow_occ" (smoothing flow).  Returns results sorted
    by the objective MSE as [((va, vb), TrialResult), ...]."""
    from ..pipeline import FlowConfig
    import jax.numpy as jnp

    def apply(field, v, betas, fcfg, scfg, fdyn, sdyn):
        if field.startswith("fflow_") or field.startswith("sflow_"):
            attr = {"lambda": "lambda_", "occ": "occ_threshold",
                    "fscale": "fscale"}[field.split("_", 1)[1]]
            if attr == "fscale":        # static (drives the pyramid shape)
                if field.startswith("fflow_"):
                    fcfg = dataclasses.replace(fcfg, **{attr: v})
                else:
                    scfg = dataclasses.replace(scfg, **{attr: v})
            else:
                # lambda_ / occ_threshold are TRACED (SMEM on the fused
                # kernel): the whole sweep reuses one compiled executable
                d = fdyn if field.startswith("fflow_") else sdyn
                d[attr] = jnp.asarray(v, jnp.float32)
        else:
            betas = dict(betas)
            betas[field] = v
        return betas, fcfg, scfg, fdyn, sdyn

    results = []
    for va in values_a:
        for vb in values_b:
            st = ({}, FlowConfig(), FlowConfig(), {}, {})
            st = apply(field_a, va, *st)
            betas, fcfg, scfg, fdyn, sdyn = apply(field_b, vb, *st)
            r = evaluate(
                clean_seqs, sigma, *_with_betas(sigma, betas),
                first_frame=first_frame, flow_cfg=fcfg,
                smooth_flow_cfg=scfg,
                flow_dyn=fdyn or None,
                # {} = "no overrides" for the smoothing direction (denoise
                # would otherwise inherit flow_dyn when sflow_dyn is None)
                sflow_dyn=sdyn if sdyn else ({} if fdyn else None),
            )
            results.append(((va, vb), r))
            if table_path:
                with open(table_path, "a") as fh:
                    fh.write(format_table_row(r) + "\n")
    results.sort(key=lambda t: t[1].mse[objective])
    return results
