## Repeatable checks. `make parity-sf001` is the per-round gate the
## verification driver mirrors: every oracle-backed registry query vs
## its DuckDB oracle at sf0.01 (the driver's scale factor).

SF001 ?= /root/testdata/sf0.01

.PHONY: test parity parity-sf001 driver-sim driver-coverage plans bench

# full local suite (sf0.001 oracles + goldens + e2e)
test:
	python -m pytest tests/ -q

# oracle parity only, default sf0.001
parity:
	python -m pytest tests/test_oracle_parity.py -q

# the driver-scale parity gate: run before ending a round
parity-sf001:
	TEST_SF_DIR=$(SF001) python -m pytest tests/test_oracle_parity.py -q

# plain-session driver simulation (no engine confs) for queries with
# no recorded driver evidence yet — run before every round ends
driver-sim:
	python tools/driver_sim.py --new

# regenerate the driver-sample rotation audit (round-11): lists
# never-sampled names and the next round's exact 50-name window
driver-coverage:
	python tools/driver_coverage.py

plans:
	python tools/dump_plans.py

bench:
	python bench.py
