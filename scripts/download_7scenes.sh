#!/bin/bash
# Download the 7-Scenes dataset (equivalent to the reference's
# scripts/download_7scenes.sh).
set -e
DEST=${1:-data/7scenes}
mkdir -p "$DEST" && cd "$DEST"
for scene in chess fire heads office pumpkin redkitchen stairs; do
  [ -d "$scene" ] && continue
  wget -c "http://download.microsoft.com/download/2/8/5/28564B23-0828-408F-8631-23B1EFF1DAC8/${scene}.zip"
  unzip -q "${scene}.zip" && rm "${scene}.zip"
  (cd "$scene" && for z in seq-*.zip; do unzip -q "$z" && rm "$z"; done)
done
echo "7-Scenes ready under $DEST"
