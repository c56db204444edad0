#!/bin/bash -e
# Rebuild the reference MUSCLE binary from /root/reference/src and
# regenerate the committed golden alignments under tests/goldens/.
#
# The goldens are the reference binary's own -align output on the seven
# BAliBASE RV11 families (sequence FASTA and .mega structure inputs,
# reference: test_scripts/run_BB_seqs.bash / run_BB_structs.bash).
# They are committed so the column-identical assertions in
# tests/test_e2e_align.py / test_e2e_mega.py / test_e2e_balibase.py run
# unconditionally on a fresh checkout.
#
# Build recipe: plain g++ over the muscle.vcxproj source list with
# -fopenmp -O2 (equivalent to the reference's vcxproj_make.py build,
# reference: src/build_linux.bash).

REF=${REF:-/root/reference}
BUILD=${BUILD:-/tmp/refbuild}
OUT=$(dirname "$0")/../tests/goldens

if [ ! -x "$BUILD/muscle" ]; then
  mkdir -p "$BUILD/o"
  # source list = the .cpp files named in the vcxproj. NOT all of src/:
  # alpha.cpp and help.cpp are present in the tree but excluded from the
  # project (alpha.cpp is a dead older-generation alphabet layer whose
  # globals conflict with alpha2.cpp at link time)
  grep -o 'Include="[^"]*\.cpp"' "$REF/src/muscle.vcxproj" \
    | sed 's/Include="//;s/"//;s|^|'"$REF"'/src/|' > "$BUILD/filelist.txt"
  # myutils.cpp #includes a generated gitver.txt (normally produced by
  # src/gitver.bash, which needs a writable git checkout)
  echo '"local"' > "$BUILD/gitver.txt"
  echo "building reference muscle ($(wc -l < "$BUILD/filelist.txt") files)..."
  parallel_jobs=$(nproc)
  cat "$BUILD/filelist.txt" | xargs -P "$parallel_jobs" -I{} sh -c \
    'g++ -c -O2 -fopenmp -DNDEBUG -I'"$BUILD"' -o '"$BUILD"'/o/$(basename {} .cpp).o {}' \
    > "$BUILD/build.log" 2>&1
  g++ -O2 -fopenmp -o "$BUILD/muscle" "$BUILD"/o/*.o >> "$BUILD/build.log" 2>&1
  echo "built $BUILD/muscle"
fi

mkdir -p "$OUT"
for acc in BB11001 BB11002 BB11004 BB11005 BB11006 BB11007 BB11009; do
  "$BUILD/muscle" -align "$REF/test_data/fa/$acc" \
      -output "$OUT/$acc.seq.afa" -quiet
  "$BUILD/muscle" -align "$REF/test_data/mega/$acc.mega" \
      -output "$OUT/$acc.mega.afa" -quiet
  echo "golden $acc done"
done
