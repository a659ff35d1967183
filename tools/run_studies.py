#!/usr/bin/env python3
"""Reference-scale validation studies driver (RESULTS.md source data).

Runs the reference's own validation workloads (SURVEY.md §4, §6) end-to-end
through the demo CLIs, capturing printed norms/gold values and wall times as
JSON lines in studies/<name>.jsonl:

  poisson      convergence sweeps over --ref (2D k=1/k=2, 3D) — rates vs
               L2 ~ h^(k+1), H10 ~ h^k (demos/poisson.py:240-247 schema)
  elasticity   Kirsch stress-error sweep, incl. the k=2 quadratic path
  biharmonic   2D/3D relative L2/H1/H2 norms
  tg_vortex    T=1, Re=100 error report (tg_vortex.py:369-374)
  cut_shell    100 load steps -> tab-tip displacement (cut_shell.py:409-414)
  pinned_shell center displacement (pinned_shell.py:281-282)

Usage: python tools/run_studies.py [study ...]   (default: the quick tier)
"""
import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "studies")
os.makedirs(OUT, exist_ok=True)

FLOAT = r"([-+0-9.eE]+)"


def run(name, cmd, patterns, timeout=7200, extra=None):
    """Run one demo; scrape `patterns` (key -> regex with one float group)."""
    t0 = time.time()
    # Default the child to the host backend unless the caller pins a
    # platform: an auto-routed big run dying on a wedged axon tunnel at
    # backend init is how round 4 lost the 3D biharmonic ref-2 row
    # (studies/biharmonic_synthetic.jsonl rc=1 @1707s, 'Unable to
    # initialize backend axon'). TPU study runs opt in explicitly with
    # IIFEA_PLATFORM=tpu (or axon) in the parent env.
    env = dict(os.environ)
    env.setdefault("IIFEA_PLATFORM", "cpu")
    try:
        p = subprocess.run(
            [sys.executable] + cmd, capture_output=True, text=True,
            timeout=timeout, cwd=HERE, env=env,
        )
        out = p.stdout + p.stderr
        rc = p.returncode
    except subprocess.TimeoutExpired as e:
        out = ((e.stdout or b"").decode() if isinstance(e.stdout, bytes)
               else (e.stdout or "")) + "\nTIMEOUT"
        rc = -1
    wall = time.time() - t0
    # label with the backend that ACTUALLY executed: config.setup prints an
    # effective-platform marker at process exit; auto-routed runs add their
    # own marker. Never assume 'tpu' — the tunnel may be down or the run
    # rerouted (ADVICE r2).
    m = re.search(r"\[iifea_tpu\] effective platform: (\S+)", out)
    plat = m.group(1) if m else os.environ.get("IIFEA_PLATFORM", "unknown")
    if "[iifea_tpu] small problem" in out:
        plat = f"{m.group(1)}(auto)" if m else "cpu(auto)"
    rec = {"cmd": " ".join(cmd), "rc": rc, "wall_s": round(wall, 1),
           "platform": plat}
    if extra:
        rec.update(extra)
    for key, pat in patterns.items():
        m = re.search(pat, out)
        rec[key] = float(m.group(1)) if m else None
    if rc != 0 or any(rec[k] is None for k in patterns):
        rec["tail"] = out[-2000:]
    with open(os.path.join(OUT, f"{name}.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(name, json.dumps(rec)[:300], flush=True)
    return rec


def poisson(refs_2d=(0, 1, 2, 3, 4, 5), refs_2d_k2=(0, 1, 2, 3),
            refs_3d=(0, 1, 2)):
    pats = {"L2": f"L2 norm: {FLOAT}", "H10": f"H10 norm: {FLOAT}",
            "H1": f"H1 norm: {FLOAT}"}
    for r in refs_2d:
        run("poisson", ["demos/poisson.py", "--k", "1", "--ref", str(r)],
            pats, extra={"k": 1, "dim": 2, "ref": r})
    for r in refs_2d_k2:
        run("poisson", ["demos/poisson.py", "--k", "2", "--ref", str(r)],
            pats, extra={"k": 2, "dim": 2, "ref": r})
    for r in refs_3d:
        run("poisson", ["demos/poisson.py", "--k", "1", "--dim", "3",
                        "--ref", str(r)],
            pats, extra={"k": 1, "dim": 3, "ref": r})


def poisson_synthetic(refs_3d=(0, 1, 2)):
    """Native immersed-pair generator: extends the 3D sweep past the
    stripped cube artifacts (R4 mesh.h5 / finer ExOps are missing blobs)."""
    pats = {"L2": f"L2 norm: {FLOAT}", "H10": f"H10 norm: {FLOAT}",
            "H1": f"H1 norm: {FLOAT}"}
    for r in refs_3d:
        run("poisson_synthetic",
            ["demos/poisson.py", "--k", "1", "--dim", "3", "--ref", str(r),
             "--mesh-root", "synthetic"],
            pats, extra={"k": 1, "dim": 3, "ref": r})


def elasticity(refs=(0, 1, 2, 3), refs_k2=(1, 2, 3, 4), lref=1):
    pats = {"stress_err": f"Extraction error norm: {FLOAT}",
            "t_solve": f"Time for solve_linear: {FLOAT}"}
    for r in refs:
        run("elasticity",
            ["demos/linear_elasticity.py", "--k", "1", "--ref", str(r)],
            pats, extra={"k": 1, "ref": r})
    for r in refs_k2:
        # quadratic path (linear_elasticity.py:226-228, NFields=2) — VERDICT
        # r1 item 7. lref=1 (local refinement near the hole) is required for
        # the h^2 stress rate: at lref=0 the error saturates ~1.5e-2 on the
        # unrefined hole geometry (verified solver-independent).
        run("elasticity",
            ["demos/linear_elasticity.py", "--k", "2", "--ref", str(r),
             "--lref", str(lref)],
            pats, extra={"k": 2, "ref": r, "lref": lref})


def biharmonic_steep(refs_2d=(2, 3, 4, 5)):
    """Reference artifacts driven with the steep manufactured solution:
    shows the framework's discretization+extraction chain at its actual
    asymptotic rate (the reference's own exact solution is too flat to
    leave the secondary-floor regime, see biharmonic_synthetic_steep)."""
    pats = {"L2": f"relative L2 norm: {FLOAT}",
            "H1": f"relative H1 norm: {FLOAT}",
            "H2": f"relative H2 norm: {FLOAT}"}
    for r in refs_2d:
        run("biharmonic", ["demos/biharmonic.py", "--ref", str(r),
                           "--mms", "steep"],
            pats, extra={"dim": 2, "ref": r, "mms": "steep"})


def biharmonic(refs_2d=(1, 2, 3), refs_3d=(0,)):
    # 3D capped at R0: cube/Quadratic/R1+ ExOp_Cons.csv are stripped blobs
    # in this checkout (/root/reference/.MISSING_LARGE_BLOBS)
    pats = {"L2": f"relative L2 norm: {FLOAT}",
            "H1": f"relative H1 norm: {FLOAT}",
            "H2": f"relative H2 norm: {FLOAT}"}
    for r in refs_2d:
        run("biharmonic", ["demos/biharmonic.py", "--ref", str(r)],
            pats, extra={"dim": 2, "ref": r})
    for r in refs_3d:
        run("biharmonic",
            ["demos/biharmonic.py", "--dim", "3", "--ref", str(r)],
            pats, extra={"dim": 3, "ref": r})


TG_PATS = {"L2u": f"L2 velocity error: {FLOAT}",
           "H1u": f"H1 velocity error: {FLOAT}",
           "L2p": f"L2 pressure error: {FLOAT}",
           "L2p0": f"L2 pressure error \\(mean-removed\\): {FLOAT}",
           "H1p": f"H1 pressure error: {FLOAT}"}


def tg_vortex(refs=(1, 2, 3)):
    for r in refs:
        run("tg_vortex",
            ["demos/tg_vortex.py", "--k", "1", "--ref", str(r),
             "--Re", "100", "--T", "1.0"],
            TG_PATS, timeout=4 * 3600, extra={"ref": r})


def tg_pressure(refs=(1, 2, 3)):
    """Pressure-accuracy validation (VERDICT r2 weak #2): raw L2p carries
    the enclosed-flow constant offset (parity with the reference, whose
    dom_constant is a zero form); the mean-removed L2p0 plus the
    --pin-pressure run demonstrate the pressure itself converges."""
    for r in refs:
        run("tg_pressure",
            ["demos/tg_vortex.py", "--k", "1", "--ref", str(r),
             "--Re", "100", "--T", "1.0", "--pin-pressure", "True"],
            TG_PATS, timeout=4 * 3600, extra={"ref": r, "pin_pressure": True})


def tg_synthetic(refs=(1, 2, 3)):
    """Nested-grid TG sweep on the on-device mg path (VERDICT r3 #5): the
    synthetic immersed pair is nested by construction (tg_vortex.py:81-82,
    n_fg=2*n_bg) and gmres+mg is the block-MG product path, so this gives
    the NS family the same convergence table elasticity_synthetic and
    biharmonic_synthetic give theirs.

    Ref 1 (the coarsest cut, 243 bg dofs) carries a near-singular
    linearization — raw Newton diverges with every pc and with --bfr
    (round-4 finding). It runs with pseudo-transient continuation + line
    search (solvers/newton.py, capabilities the reference lacks), which
    converges it onto the rate-2 curve (L2u ref1/ref2 = 3.96)."""
    for r in refs:
        extra_flags, solver = [], "gmres+mg"
        if r <= 1:
            extra_flags = ["--ptc", "0.05", "--line-search"]
            solver = "gmres+mg+ptc+ls"
        run("tg_synthetic",
            ["demos/tg_vortex.py", "--k", "1", "--ref", str(r),
             "--Re", "100", "--T", "1.0", "--mesh-root", "synthetic",
             "--solv", "gmres", "--pc", "mg"] + extra_flags,
            TG_PATS, timeout=4 * 3600, extra={"ref": r, "solver": solver})


def cut_shell():
    pats = {"tip_x": f"Displacement at tip of tab: \\( {FLOAT} ,",
            "tip_y": f"Displacement at tip of tab: \\( [-+0-9.eE]+ , {FLOAT} ,",
            "tip_z":
            f"Displacement at tip of tab: \\( [-+0-9.eE]+ , [-+0-9.eE]+ , {FLOAT} \\)"}
    run("cut_shell", ["demos/cut_shell.py"], pats, timeout=8 * 3600)


def pinned_shell():
    pats = {"disp_x": f"Center displacement: \\( {FLOAT} ,",
            "disp_y": f"Center displacement: \\( [-+0-9.eE]+ , {FLOAT} ,",
            "disp_z":
            f"Center displacement: \\( [-+0-9.eE]+ , [-+0-9.eE]+ , {FLOAT} \\)"}
    run("pinned_shell", ["demos/pinned_shell.py"], pats, timeout=2 * 3600)


def unfitted():
    """The background_unfitted family (D7-D10): runtime transfer matrix /
    B-spline background instead of CSV extraction artifacts."""
    pats = {"L2": f"L2 norm: {FLOAT}", "H1": f"H1 norm: {FLOAT}"}
    for n in (16, 32, 64):
        run("unfitted",
            ["demos/background_unfitted/poisson_unfitted.py", "--n", str(n)],
            pats, extra={"demo": "poisson_unfitted", "n": n,
                         "ref": {16: 0, 32: 1, 64: 2}[n]})
    pats_tg = {"L2u": f"L2 velocity error: {FLOAT}",
               "H1u": f"H1 velocity error: {FLOAT}",
               "L2p": f"L2 pressure error: {FLOAT}",
               "H1p": f"H1 pressure error: {FLOAT}"}
    for r in (1, 2):
        run("unfitted",
            ["demos/background_unfitted/tg_unfitted.py", "--ref", str(r),
             "--Re", "100", "--T", "1.0"],
            pats_tg, extra={"demo": "tg_unfitted", "ref": r})
    run("unfitted", ["demos/background_unfitted/pinned_shell_unfitted.py"],
        {"disp_z":
         f"Center displacement: \\( [-+0-9.eE]+ , [-+0-9.eE]+ , {FLOAT} \\)"},
        extra={"demo": "pinned_shell_unfitted"})
    run("unfitted", ["demos/background_unfitted/cut_shell_unfitted.py"],
        {"tip_z": f"Displacement at tip of tab: "
                  f"\\( [-+0-9.eE]+ , [-+0-9.eE]+ , {FLOAT} \\)"},
        timeout=2 * 3600, extra={"demo": "cut_shell_unfitted"})


def elasticity_synthetic(refs=(0, 1, 2, 3)):
    """Synthetic immersed elasticity: the on-device block-MG product path
    (demos/linear_elasticity.py --mesh-root synthetic)."""
    pats = {"L2": f"relative L2 norm: {FLOAT}",
            "H10": f"relative H10 norm: {FLOAT}",
            "t_solve": f"Time for solve_linear: {FLOAT}"}
    for r in refs:
        run("elasticity_synthetic",
            ["demos/linear_elasticity.py", "--mesh-root", "synthetic",
             "--ref", str(r)],
            pats, extra={"ref": r, "solver": "cg+mg"})


def biharmonic_synthetic(refs_2d=(0, 1, 2, 3), refs_3d=(0, 1, 2)):
    """Synthetic quadratic-B-spline biharmonic: the on-device radius-3
    stencil + MG product path; the 3D sweep supplies the convergence
    evidence the stripped cube-Quadratic CSVs cannot (VERDICT r2 #4)."""
    pats = {"L2": f"relative L2 norm: {FLOAT}",
            "H1": f"relative H1 norm: {FLOAT}",
            "H2": f"relative H2 norm: {FLOAT}"}
    for r in refs_2d:
        run("biharmonic_synthetic",
            ["demos/biharmonic.py", "--mesh-root", "synthetic",
             "--ref", str(r)],
            pats, timeout=3 * 3600,
            extra={"dim": 2, "ref": r, "solver": "gmres+mg"})
    for r in refs_3d:
        run("biharmonic_synthetic",
            ["demos/biharmonic.py", "--mesh-root", "synthetic",
             "--dim", "3", "--ref", str(r)],
            pats, timeout=6 * 3600,
            extra={"dim": 3, "ref": r, "solver": "gmres+mg"})


def biharmonic_synthetic_steep(refs_2d=(0, 1, 2, 3)):
    """2D synthetic sweep with the steep manufactured solution: the
    reference's own 2D exact solution is nearly flat (relative errors start
    ~1e-5, the level of secondary floors), so it cannot exhibit the
    asymptotic rate; the wavelength-2 cosines can."""
    pats = {"L2": f"relative L2 norm: {FLOAT}",
            "H1": f"relative H1 norm: {FLOAT}",
            "H2": f"relative H2 norm: {FLOAT}"}
    for r in refs_2d:
        run("biharmonic_synthetic",
            ["demos/biharmonic.py", "--mesh-root", "synthetic",
             "--ref", str(r), "--mms", "steep"],
            pats, timeout=3 * 3600,
            extra={"dim": 2, "ref": r, "solver": "gmres+mg",
                   "mms": "steep"})


STUDIES = {
    "poisson": poisson,
    "poisson_synthetic": poisson_synthetic,
    "elasticity": elasticity,
    "elasticity_synthetic": elasticity_synthetic,
    "biharmonic": biharmonic,
    "biharmonic_steep": biharmonic_steep,
    "biharmonic_synthetic": biharmonic_synthetic,
    "biharmonic_synthetic_steep": biharmonic_synthetic_steep,
    "tg_vortex": tg_vortex,
    "tg_pressure": tg_pressure,
    "tg_synthetic": tg_synthetic,
    "cut_shell": cut_shell,
    "pinned_shell": pinned_shell,
    "unfitted": unfitted,
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["poisson", "elasticity", "biharmonic"]
    for n in names:
        STUDIES[n]()
