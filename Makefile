# Developer conveniences (counterpart of the reference Makefile:1-28).

.PHONY: test test-fast native bench clean

test:            ## full suite on a virtual 8-device CPU mesh
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -m pytest tests/ -q

test-fast:       ## skip the slow multi-process / end-to-end tests
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -m pytest tests/ -q -m "not slow"

native:          ## build the C++ data-loading components
	$(MAKE) -C native

bench:           ## headline benchmark on the attached TPU (one JSON line)
	python bench.py

clean:
	rm -rf outputs logs .pytest_cache
	find . -name __pycache__ -type d -prune -exec rm -rf {} +
	$(MAKE) -C native clean
