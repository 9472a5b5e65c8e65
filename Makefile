test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -k "not smoke and not parity_curves and not curve_parity"

bench:
	python bench.py

arbiters:  # train + install eval arbiters at the default --autoencoder/--classifier paths
	bash scripts/train_arbiters.sh

lint:
	python -m compileall -q generative_models_tpu tests scripts bench.py __graft_entry__.py
	python scripts/lint.py

.PHONY: test test-fast bench lint arbiters
