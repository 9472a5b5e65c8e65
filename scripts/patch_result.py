"""Patch ONE model's row in RESULTS.json from a finished CLI run logdir.

scripts/collect_results.py rebuilds RESULTS.json from a full zoo logroot;
this helper instead refreshes a single model's entry in place (e.g. after
re-running just `gan` for more epochs on chip) without discarding the other
models' recorded runs.

Usage: python scripts/patch_result.py LOGDIR MODEL [RESULTS.json]
"""

import json
import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).parent))
from collect_results import model_results  # noqa: E402


def main():
    logdir = Path(sys.argv[1])
    model = sys.argv[2]
    out_path = Path(sys.argv[3] if len(sys.argv) > 3 else 'RESULTS.json')
    entry = model_results(logdir, model)
    hps = yaml.safe_load((logdir / 'hps.yaml').read_text())
    entry['device'] = hps.get('jax_backend', 'unknown')
    result = json.loads(out_path.read_text())
    old = result['models'].get(model)
    print('old:', json.dumps(old))
    print('new:', json.dumps(entry))
    result['models'][model] = entry
    out_path.write_text(json.dumps(result, indent=1))
    print('wrote', out_path)


if __name__ == '__main__':
    main()
