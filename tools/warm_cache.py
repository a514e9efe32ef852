"""(Re)generate the committed compile-cache probe entry.

``utils/compilation_cache.cache_probe`` compiles one tiny fixed program
and asserts it is served from the committed ``.jax_cache/``; a
platform/jaxlib bump invalidates every committed entry and turns warm
benchmark runs cold.  This script writes the probe's entry for the
CURRENT backend (run it on the TPU, where the cache matters):

    python tools/warm_cache.py

After a toolchain bump: run this, then ``python bench.py`` to
re-populate every bench-stage kernel entry, then commit the refreshed
``.jax_cache/`` (prune unrelated growth first — see CLAUDE.md).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from queasars_tpu.utils.compilation_cache import cache_probe, enable_persistent_cache


def main() -> None:
    cache_dir = enable_persistent_cache()
    first = cache_probe()
    print(f"cache dir: {cache_dir}")
    print(f"probe on {first['backend']}: {first}")
    if first["hits"] == 0:
        print("probe entry written (was cold); verify it round-trips in a fresh process:")
        print("  python -c 'from queasars_tpu.utils.compilation_cache import *; "
              "enable_persistent_cache(); print(cache_probe())'")
    else:
        print("cache already warm for this backend/toolchain")


if __name__ == "__main__":
    main()
