#!/bin/bash
# Build a reference binary with a different compile-time material model.
#
# The reference selects its shading algorithm with a `using` alias
# (materials/materials.h:57-61); goldens for the Basic and MonteCarloGI
# integrators require a rebuild with the alias switched. Usage:
#
#   bash tools/build_reference_variant.sh MtlBlinn_Basic        # -> /tmp/qref-basic/qaray
#   bash tools/build_reference_variant.sh MtlBlinn_MonteCarloGI # -> /tmp/qref-mcgi/qaray
#
# Applies the same three compile/UB patches as tools/build_reference.sh.
set -euo pipefail

VARIANT="${1:?usage: build_reference_variant.sh MtlBlinn_Basic|MtlBlinn_MonteCarloGI|MtlBlinn_PathTracing}"
case "$VARIANT" in
  MtlBlinn_Basic) TAG=basic ;;
  MtlBlinn_MonteCarloGI) TAG=mcgi ;;
  MtlBlinn_PathTracing) TAG=pathtrace ;;
  *) echo "unknown variant $VARIANT"; exit 1 ;;
esac

SRC="/tmp/qref-src-$TAG"
OUT="/tmp/qref-$TAG"
rm -rf "$SRC"
cp -r /root/reference "$SRC"
chmod -R u+w "$SRC"

sed -i 's/renderImage->/renderImage./g' "$SRC/src/renderers/Renderer_MPI.cpp"
sed -i '1i #include <memory>' "$SRC/src/main.cpp"
python3 - "$SRC/src/mesh/TriMesh.h" <<'EOF'
import sys
p = sys.argv[1]
s = open(p).read()
needle = "      idx = t.idx;\n    };"
assert needle in s, "TriMesh.h patch anchor not found"
s = s.replace(needle, "      idx = t.idx;\n      return *this;\n    };")
open(p, "w").write(s)
EOF

# Switch the integrator alias.
sed -i "s/^using MtlBlinn = MtlBlinn_PhotonMap;/using MtlBlinn = $VARIANT;/" \
    "$SRC/src/materials/materials.h"
grep -q "^using MtlBlinn = $VARIANT;" "$SRC/src/materials/materials.h"

mkdir -p "$OUT/build"
cd "$OUT/build"
cmake "$SRC" -DCMAKE_BUILD_TYPE=Release -DENABLE_GUI=OFF -DENABLE_MPI=OFF \
    -DCMAKE_CXX_FLAGS="-O3 -march=native" >/dev/null
make -j"$(nproc)" qaray >/dev/null 2>&1 || make qaray
cp "$(find "$OUT/build" -name qaray -type f | head -1)" "$OUT/qaray"
echo "built: $OUT/qaray ($VARIANT)"
