# Developer entry points (reference analog: libsbn Makefile:5-65).

.PHONY: test fasttest lint native bench parity clean

# Fast tier: excludes tests marked slow (>30 s); the `make fasttest`
# analog of reference Makefile:17-21. ~3 min on the 2-core host.
fasttest:
	python -m pytest tests/ -x -q

# Full round gate: every test including the slow tail.
test:
	python -m pytest tests/ -x -q --runslow

# Style gate (reference Makefile:54-65 runs clang-format/clang-tidy/
# cpplint/black; none are in this image — tools/lint.py enforces the
# mechanical subset).
lint:
	python tools/lint.py

native:
	$(MAKE) -C native all cpu_baseline

bench:
	python bench.py

parity:
	python bench.py --parity

clean:
	$(MAKE) -C native clean
