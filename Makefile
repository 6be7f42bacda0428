# Developer entry points (reference: Makefile:22-36)

.PHONY: test test-full train bench clean

# pytest-xdist workers: auto = one per CPU. --dist loadfile keeps each test
# file on one worker, so module-scoped fixtures (tiny CLIP towers, torch
# oracles, synthetic corpora) build once per file instead of once per test.
WORKERS ?= auto

test:  ## fast tests only
	python -m pytest tests/ -q -m "not slow" -n $(WORKERS) --dist loadfile

test-full:  ## everything, including slow integration tests
	python -m pytest tests/ -q -n $(WORKERS) --dist loadfile

train:  ## synthetic end-to-end sanity run on CPU
	JAX_PLATFORMS=cpu python train.py experiment=synthetic trainer.max_epochs=2

bench:  ## throughput benchmark on the available accelerator
	python bench.py

clean:
	rm -rf logs __pycache__ .pytest_cache
