"""CLI: pack the unzipped OpenEDS dataset into the training H5
(reference: data/prepare_openeds.py).

    python prepare_openeds.py --base_path /path/to/openeds [--limit N]
"""
from seg2eye_tpu.data.prepare_openeds import main

if __name__ == "__main__":
    main()
