test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -k "not smoke"

bench:
	python bench.py

lint:
	python -m compileall -q generative_models_tpu tests scripts bench.py __graft_entry__.py
	python scripts/lint.py

.PHONY: test test-fast bench lint
