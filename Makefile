.PHONY: style quality test bench

check_dirs := parler_tts_tpu tests helpers benchmarks bench.py __graft_entry__.py

style:
	python -m ruff check --fix $(check_dirs) 2>/dev/null || true

quality:
	python -m ruff check $(check_dirs) 2>/dev/null || python -m py_compile $$(find parler_tts_tpu -name '*.py')

test:
	python -m pytest tests/ -q

bench:
	python bench.py
