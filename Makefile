# Developer entry points (reference: Makefile:22-36)

.PHONY: test test-full train bench clean

test:  ## fast tests only
	python -m pytest tests/ -q -m "not slow"

test-full:  ## everything, including slow integration tests
	python -m pytest tests/ -q

train:  ## synthetic end-to-end sanity run on CPU
	JAX_PLATFORMS=cpu python train.py experiment=synthetic trainer.max_epochs=2

bench:  ## throughput benchmark on the available accelerator
	python bench.py

clean:
	rm -rf logs __pycache__ .pytest_cache
