#!/bin/bash
# Build the patched reference C++ renderer at /tmp/qref/qaray.
#
# The upstream tree (/root/reference) does not compile as-is in the non-GUI,
# non-MPI configuration; three fixes are required (all are upstream bugs,
# none change rendering behavior):
#   1. Renderer_MPI.cpp #else block uses `renderImage->` on the global
#      FrameBuffer value (renderers/Renderer_MPI.cpp:209-213) — must be `.`.
#   2. main.cpp uses std::unique_ptr without including <memory>.
#   3. TriMesh.h TriFace::operator= (mesh/TriMesh.h:58-67) falls off the end
#      of a value-returning function for every non-self assignment — UB that
#      crashes multi-triangle OBJ loads in optimized builds. Add the missing
#      `return *this`.
#
# Build: CMake Release, GUI off, MPI off, OpenMP tasking backend. The result
# is the binary used for golden generation (tools/make_goldens.py), the
# measured baseline in BASELINE.md, and high-spp parity renders.
set -euo pipefail

SRC=/tmp/qref-src
OUT=/tmp/qref
rm -rf "$SRC"
cp -r /root/reference "$SRC"
chmod -R u+w "$SRC"

# Patch 1: member access on the global FrameBuffer value.
sed -i 's/renderImage->/renderImage./g' "$SRC/src/renderers/Renderer_MPI.cpp"
# Patch 2: missing <memory> include.
sed -i '1i #include <memory>' "$SRC/src/main.cpp"
# Patch 3: missing return in TriFace::operator= (insert before the closing
# "    };" of the operator body — the line after "idx = t.idx;").
python3 - "$SRC/src/mesh/TriMesh.h" <<'EOF'
import sys
p = sys.argv[1]
s = open(p).read()
needle = "      idx = t.idx;\n    };"
assert needle in s, "TriMesh.h patch anchor not found"
s = s.replace(needle, "      idx = t.idx;\n      return *this;\n    };")
open(p, "w").write(s)
EOF

mkdir -p "$OUT/build"
cd "$OUT/build"
cmake "$SRC" -DCMAKE_BUILD_TYPE=Release -DENABLE_GUI=OFF -DENABLE_MPI=OFF \
    -DCMAKE_CXX_FLAGS="-O3 -march=native" >/dev/null
make -j"$(nproc)" qaray >/dev/null 2>&1 || make qaray
cp "$(find "$OUT/build" -name qaray -type f | head -1)" "$OUT/qaray" 2>/dev/null || true
[ -f "$OUT/qaray" ] || cp "$OUT/build/qaray" "$OUT/qaray"
echo "built: $OUT/qaray"
"$OUT/qaray" 2>&1 | head -2 || true
