test:
	python -m pytest tests/ -x -q

# the LIVE-regeneration parity suite self-skips off-chip (20+min XLA-CPU
# compiles) unless GMT_LIVE_PARITY=1; the fast recorded-parity tests
# (test_parity_recorded.py) always run
test-fast:
	python -m pytest tests/ -x -q -k "not smoke"

# the 12-model parity suite on the real chip (~15 min; on the 1-core XLA-CPU
# fallback some conv-model jit compiles alone take 20+ min, so prefer this
# when a chip is attached)
test-parity-tpu:
	GMT_TESTS_ON_TPU=1 python -m pytest tests/test_parity_curves.py -v

# re-record OUR chip curves for the fast recorded-parity test (~15 min)
parity-record:
	python scripts/record_parity_curves.py

bench:
	python bench.py

arbiters:  # train + install eval arbiters at the default --autoencoder/--classifier paths
	bash scripts/train_arbiters.sh

distill:  # progressive-distillation chain (256-step teacher -> 1-step student)
	bash scripts/progressive_distillation.sh
	bash scripts/eval_distill_chain.sh
	python scripts/collect_distill.py
	python scripts/distill_latency.py

results:  # measured zoo quality tables (bits/dim, FID, P/R) -> RESULTS.json
	bash scripts/zoo_results.sh
	python scripts/collect_results.py
	python scripts/render_results.py

results-md:  # re-render docs/RESULTS.md from the checked-in artifacts
	python scripts/render_results.py

sampler-sweep:  # FID-vs-steps sweep for ddim/dpm2m -> EVAL.json fast_sampler_sweep
	python scripts/sampler_sweep.py /tmp/sampler_sweep
	python scripts/render_results.py

results-catchup:  # after a chip outage: redo CPU-fallback rows on chip, refresh artifacts
	bash scripts/chip_catchup.sh --force-cpu-redo

lint:
	python -m compileall -q generative_models_tpu tests scripts bench.py __graft_entry__.py
	python scripts/lint.py

.PHONY: test test-fast test-parity-tpu parity-record bench lint arbiters distill results results-md results-catchup sampler-sweep
