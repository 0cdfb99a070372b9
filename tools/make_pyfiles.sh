#!/bin/sh
# Build the --py-files artifact for cluster submission:
#   sh tools/make_pyfiles.sh  ->  dist/bifrost_spark.zip
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/bifrost_spark.zip
python -c "
import zipfile, pathlib
zf = zipfile.ZipFile('dist/bifrost_spark.zip', 'w', zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path('bifrost_spark').rglob('*.py')):
    zf.write(p, p.as_posix())
zf.close()
print('dist/bifrost_spark.zip')
"
