# Convenience targets. NOTE: on the axon TPU image, run CPU-only python with
# PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu to avoid contending with a TPU job.

.PHONY: test test-fast bench native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_config.py tests/test_grid.py tests/test_grains.py \
	  tests/test_io.py tests/test_native.py tests/test_gmres.py -q

bench:
	python bench.py

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	rm -rf output output_* __pycache__ */__pycache__
