"""TI showcase at reference protocol scale on the FastSim fast path.

Reference protocol (src/properties/water_sol.rs:50-55, 583-612):
13 lambda windows x (5,000 equil + 20,000 prod) steps, dt 2 fs, 35 A
water box. Runs `run_sol_sim_fast` (sequential windows on the colpair/PME
engine) for one solute and records wall-clock + dG + SEM into
docs/TI_SHOWCASE.json.

Run on the chip from the repo root:  timeout 5400 python scripts/ti_showcase.py
Quick CPU smoke:                     python scripts/ti_showcase.py --quick
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    quick = "--quick" in sys.argv
    if quick:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from molchanica_tpu.molecules.embed import embed_3d
    from molchanica_tpu.molecules.smiles import from_smiles
    from molchanica_tpu.properties.water_sol import run_sol_sim_fast

    # methanol: small, classic hydration-FE benchmark solute
    mol = from_smiles("CO")
    embed_3d(mol)
    spec = mol.to_spec(strict=False)

    kw = dict(verbose=True, seed=3)
    if quick:
        kw.update(box_side=24.5, lambdas=[0.0, 0.5, 1.0],
                  equil_steps=60, prod_steps=120,
                  cfg_overrides=dict(lj_cutoff=6.0, coulomb_cutoff=6.0))
    t0 = time.perf_counter()
    props = run_sol_sim_fast(spec, **kw)
    wall = time.perf_counter() - t0

    result = {
        "protocol": ("quick" if quick else
                     "reference: 13 lambda x (5k+20k) steps, 2 fs, 35 A"),
        "solute": "methanol",
        "dg_hydration_kcal": round(props.dg_hydration_kcal, 3),
        "dg_sem_kcal": round(props.dg_sem_kcal, 3),
        "mean_coupled_interaction_kcal":
            round(props.mean_coupled_interaction_kcal, 3),
        "mean_n_water_contacts": round(props.mean_n_water_contacts, 2),
        "mean_n_h_bonds": round(props.mean_n_h_bonds, 2),
        "n_windows": len(props.windows),
        "wall_s": round(wall, 1),
    }
    print(json.dumps(result))
    if not quick:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "docs", "TI_SHOWCASE.json")
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
