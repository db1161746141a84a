"""Generate tests/fixtures/oracle_pins.npz (oracle drift pins).

Run from the repo root:  python tests/make_oracle_pins.py

Only regenerate after a DELIBERATE oracle change — the whole point of the
fixture is that git history pins the oracle's behavior (see
tests/oracle_pins_defs.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import oracle_pins_defs as defs  # noqa: E402


def main():
    tables = defs.sample_inputs()
    payload = {}
    for name in defs.all_names():
        inputs = tables[name]
        keys = sorted(inputs)
        n = len(inputs[keys[0]])
        out_rows = []
        out_keys = None
        for i in range(n):
            row = {k: float(inputs[k][i]) for k in keys}
            out = defs.evaluate_row(name, row)
            if out_keys is None:
                out_keys = sorted(out)
            out_rows.append([float(out[k]) for k in out_keys])
        payload[f"{name}/inkeys"] = np.array(keys)
        payload[f"{name}/inputs"] = np.stack(
            [np.asarray(inputs[k], np.float64) for k in keys], axis=1)
        payload[f"{name}/outkeys"] = np.array(out_keys)
        payload[f"{name}/outputs"] = np.asarray(out_rows, np.float64)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "oracle_pins.npz")
    np.savez_compressed(path, **payload)
    npts = sum(v.shape[0] for k, v in payload.items()
               if k.endswith("/outputs"))
    print(f"wrote {path}: {len(defs.all_names())} configs, "
          f"{npts} pinned points")


if __name__ == "__main__":
    main()
