"""Re-bless the committed golden images (docs/images/*.png).

The bench gates every run against these goldens (bench.check_golden) the way
the reference pins its output with README screenshots. After a DELIBERATE
visual change, run this on the TPU to regenerate them:

    python tools/bless_goldens.py            # cornell conformance golden
    python tools/bless_goldens.py --bench    # + full bench -> bench golden

--bench runs the whole benchmark (~15 min incl. compile) because the bench
golden is the final fly-through frame of the exact bench program.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["ARCTIC_BLESS"] = "1"

import bench  # noqa: E402


def main() -> None:
    if "--bench" in sys.argv:
        bench.main()  # blesses BOTH goldens (conformance runs inside main)
    else:
        bench.conformance_checks()


if __name__ == "__main__":
    main()
