#!/usr/bin/env python
"""Xeno-canto bird-recording downloader (reference scripts/utils/xeno-canto-dl.py).

Downloads recordings for a species list via the public xeno-canto API
(no `xenopy` dependency — plain urllib). Requires network access.

    python scripts/utils/xeno_canto_dl.py --output_dir data/birds --max_per_species 10
"""
from __future__ import annotations

import json
import sys
import urllib.parse
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from vampnet_tpu import config as cfglib

SPECIES = [
    "American Robin", "Northern Cardinal", "Mourning Dove", "American Crow",
    "Baltimore Oriole", "Blue Jay", "Eastern Bluebird", "House Finch",
    "American Goldfinch", "House Sparrow", "Song Sparrow", "Tufted Titmouse",
    "White-breasted Nuthatch", "European Starling", "American Redstart",
    "Red-winged Blackbird", "Brown-headed Cowbird", "Common Grackle",
    "Common Yellowthroat", "Northern Mockingbird", "Carolina Wren",
    "Eastern Meadowlark", "Chipping Sparrow", "Tree Swallow", "Barn Swallow",
]

API = "https://xeno-canto.org/api/2/recordings"


def download_species(name: str, output_dir: Path, max_recordings: int = 10,
                     quality: str = "A") -> int:  # pragma: no cover - network
    query = urllib.parse.quote(f"{name} q:{quality}")
    with urllib.request.urlopen(f"{API}?query={query}") as r:
        data = json.loads(r.read())
    out = output_dir / name.replace(" ", "_")
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    for rec in data.get("recordings", [])[:max_recordings]:
        url = rec["file"]
        if url.startswith("//"):
            url = "https:" + url
        dest = out / f"{rec['id']}.mp3"
        if dest.exists():
            continue
        try:
            urllib.request.urlretrieve(url, dest)
            n += 1
        except Exception as e:
            print(f"  failed {url}: {e}")
    print(f"{name}: downloaded {n} recordings")
    return n


def main(argv=None):  # pragma: no cover - network
    args = cfglib.parse_args(argv)
    output_dir = Path(args.get("output_dir", "data/xeno-canto"))
    total = 0
    for sp in SPECIES:
        total += download_species(
            sp, output_dir, max_recordings=int(args.get("max_per_species", 10))
        )
    print(f"downloaded {total} recordings to {output_dir}")


if __name__ == "__main__":
    main()
