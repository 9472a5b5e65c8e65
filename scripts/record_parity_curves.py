"""Record OUR models' loss curves on the real chip at FULL reference length.

Runs every model in reference_cpu_baseline.json through the shared parity
workload (tests/parity_common.py::run_ours, cap=False — no CPU-runtime step
caps) and writes parity_ours_tpu.json at the repo root. The checked-in
artifact lets tests/test_parity_recorded.py assert the full parity contract
in milliseconds on any host, where live regeneration needs a chip (or 20+
minute XLA-CPU conv compiles per model on a 1-core host).

Usage: python scripts/record_parity_curves.py  (on the TPU host; ~15 min)
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / 'tests'))


def main():
    import jax

    from parity_common import KEY_OVERRIDE, OURS_PATH, REF, run_ours

    out = {
        'description': (
            'OUR models loss curves on the shared deterministic parity '
            'workload (generative_models_tpu/data/parity.py), full '
            'reference length, recorded by scripts/record_parity_curves.py. '
            'Compared against reference_cpu_baseline.json by '
            'tests/test_parity_recorded.py. Reference loop: '
            'gms/main.py:152-217.'
        ),
        'device': str(jax.devices()[0].device_kind),
        'date': time.strftime('%Y-%m-%d'),
        'curves': {},
    }
    for name in sorted(REF):
        t0 = time.time()
        ours, ref = run_ours(name, cap=False)
        out['curves'][name] = {
            'ours': ours,
            'steps': len(ours),
            'key': KEY_OVERRIDE.get(name, REF[name]['key']),
            'bs': REF[name]['bs'],
            'record_sec': round(time.time() - t0, 1),
        }
        print(
            f'{name}: {len(ours)} steps in {time.time() - t0:.1f}s '
            f'first={ours[0]:.4f} last={ours[-1]:.4f} (ref last={ref[-1]:.4f})',
            flush=True,
        )
    OURS_PATH.write_text(json.dumps(out, indent=1))
    print(f'wrote {OURS_PATH}')


if __name__ == '__main__':
    main()
