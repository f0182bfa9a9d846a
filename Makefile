.PHONY: test test-fast bench demo dryrun native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_geometry.py tests/test_anchors.py \
	  tests/test_losses.py tests/test_evaluate.py tests/test_coco.py \
	  tests/test_masks.py tests/test_preprocess.py -q

bench:
	python bench.py

demo:
	python -m objectdetection_tpu.cli demo

dryrun:
	python __graft_entry__.py

native:
	g++ -O3 -march=native -fPIC -shared -fopenmp \
	  objectdetection_tpu/native/shapes_raster.cpp \
	  -o objectdetection_tpu/native/libshapes_raster.so

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; true
	rm -f objectdetection_tpu/native/libshapes_raster.so
