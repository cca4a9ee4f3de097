# Convenience targets. NOTE: on the axon TPU image, run CPU-only python with
# PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu to avoid contending with a TPU job.

.PHONY: test test-all test-fast bench validate3d native clean

# default tier: everything but the multi-minute trajectory/golden runs
# (~5-8 min); test-all adds the @pytest.mark.slow tier (~1 h)
test:
	python -m pytest tests/ -q -m "not slow"

test-all:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_config.py tests/test_grid.py tests/test_grains.py \
	  tests/test_io.py tests/test_native.py tests/test_gmres.py -q

# TPU-vs-CPU acceptance sweep of every 3D device op at production size —
# catches Mosaic/XLA miscompiles (e.g. the 178-slot unrolled-graph NaNs)
# before they can poison a long run. Phase 1 on the TPU, phase 2 on CPU.
validate3d:
	python scripts/validate_3d_tpu.py save
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/validate_3d_tpu.py check

# Mosaic lowering of the shard_map'd Pallas kernels on a real TPU mesh,
# asserted bitwise-equal to the single-device kernels (the CPU-mesh tests
# run these through the interpreter only)
validate-shard:
	python scripts/validate_shard_tpu.py

# bench runs the 3D op acceptance sweep first (a regression there would
# invalidate any benchmark number), then the timed benchmark
bench: validate3d validate-shard
	python bench.py

bench-only:
	python bench.py

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	rm -rf output output_* __pycache__ */__pycache__
