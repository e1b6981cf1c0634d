# Gates for this repo. `make smoke` runs before every commit (githooks/
# pre-commit); `make check` is the full suite + multichip dryrun and must
# pass before any end-of-round snapshot.

PY ?= python

.PHONY: check smoke test test-all dryrun native hooks

native:
	$(MAKE) -C native libparagraph_sw.so

# Fast pre-commit gate (~15s): imports every package module, then runs
# the round-trip genotyping oracle end-to-end (exercises BAM fetch,
# alignment, counting, genotyping, VCF emission).
smoke: native
	$(PY) -c "import pkgutil, importlib, paragraph_tpu; \
	  [importlib.import_module(m.name) for m in pkgutil.walk_packages( \
	    paragraph_tpu.__path__, 'paragraph_tpu.')]"
	$(PY) -m pytest tests/test_roundtrip.py -x -q

# fast tier (slow-marked e2e tests deselected by pytest.ini addopts)
test: native
	$(PY) -m pytest tests/ -x -q

# full tier: everything, including slow-marked e2e tests
test-all: native
	$(PY) -m pytest tests/ -x -q -m ""


dryrun:
	$(PY) -c "import os; \
	  os.environ['JAX_PLATFORMS']='cpu'; \
	  os.environ['XLA_FLAGS']=os.environ.get('XLA_FLAGS','')+' --xla_force_host_platform_device_count=8'; \
	  import jax; jax.config.update('jax_platforms','cpu'); \
	  import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"

check: test-all dryrun

# one-time: route git hooks through the tracked githooks/ dir
hooks:
	git config core.hooksPath githooks
