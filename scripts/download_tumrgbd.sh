#!/bin/bash
# Download the TUM-RGBD freiburg1 sequences used by the evaluation driver
# (equivalent to the reference's scripts/download_tumrgbd.sh).
set -e
DEST=${1:-data/tumrgbd}
mkdir -p "$DEST" && cd "$DEST"
for scene in 360 desk desk2 floor plant room rpy teddy xyz; do
  name="rgbd_dataset_freiburg1_${scene}"
  [ -d "$name" ] && continue
  wget -c "https://cvg.cit.tum.de/rgbd/dataset/freiburg1/${name}.tgz"
  tar -xzf "${name}.tgz" && rm "${name}.tgz"
done
echo "TUM-RGBD freiburg1 ready under $DEST"
