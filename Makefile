.PHONY: all native test integration bench clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

integration: native
	JAX_PLATFORMS=cpu python devel/integration_test.py

bench: native
	python bench.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
