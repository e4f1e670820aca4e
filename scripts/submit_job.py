"""spark-submit primary file for the transcript dedup pipeline.

``spark-submit`` needs a driver ``.py`` on the command line (it cannot run a
module with ``-m``); this shim is that file. The engine itself ships through
``--py-files`` (see scripts/make_pyfiles.py)::

    spark-submit --master <cluster> --deploy-mode cluster \
        --py-files dist/translink.zip scripts/submit_job.py \
        --input .../transcripts.parquet --workdir .../work \
        --output .../report.json --format json

All arguments pass through to ``translink.cli``; under spark-submit the
master comes from the launcher, so ``--master`` is omitted.
"""

import sys

from translink.cli import main

if __name__ == "__main__":
    sys.exit(main())
