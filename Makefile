# Top-level entry points. `make verify-numbers` is the round cadence hook
# (VERDICT r3 #8): regenerate every number document from fresh runs so the
# docs can never fall a generation behind the code. quality runs on CPU
# (~1h); the bench half self-skips with a distinct exit-3 message when the
# axon tunnel is down (core/mesh.require_tpu).

.PHONY: native test verify-numbers quality bench backlog

native:
	$(MAKE) -C mmd_tpu/native

test:
	python -m pytest tests/ -q

quality:
	python benchmarks/quality_suite.py

bench:
	python benchmarks/bench_suite.py
	python benchmarks/bench_suite.py --write_only

verify-numbers: quality
	@python -c "from mmd_tpu.core.mesh import require_tpu; require_tpu()" \
	  && $(MAKE) bench \
	  || echo "verify-numbers: TPU unreachable — quality regenerated, bench skipped"

# the full one-session TPU measurement backlog (headline, suite, A/Bs,
# training drive, 35k-row pipeline, doc regeneration)
backlog:
	bash tools/tpu_backlog.sh
