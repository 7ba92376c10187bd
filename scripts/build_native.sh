#!/bin/sh
# Build the native host runtime (native/innr_host.c) into
# innr_tpu/_native_lib/libinnr_host.so. Pure C99, no dependencies.
#
#   scripts/build_native.sh            # build the shared library
#   scripts/build_native.sh sanitize   # ASan + TSan stress runs
#                                      # (native/innr_host_stress.c)
set -e
cd "$(dirname "$0")/.."
CC="${CC:-cc}"

if [ "${1:-}" = "sanitize" ]; then
  # The threaded encoders claim determinism via disjoint output ranges;
  # these builds make the claim checked, not argued (thread counts that
  # split rows at non-multiples of the chunk size, odd word counts).
  mkdir -p build
  $CC -O1 -g -std=c99 -pthread -fsanitize=address -fno-omit-frame-pointer \
      -Wall -Wextra -o build/innr_stress_asan \
      native/innr_host.c native/innr_host_stress.c
  ./build/innr_stress_asan
  echo "ASan stress: OK"
  $CC -O1 -g -std=c99 -pthread -fsanitize=thread -fno-omit-frame-pointer \
      -Wall -Wextra -o build/innr_stress_tsan \
      native/innr_host.c native/innr_host_stress.c
  ./build/innr_stress_tsan
  echo "TSan stress: OK"
  exit 0
fi

mkdir -p innr_tpu/_native_lib
$CC -O3 -std=c99 -shared -fPIC -pthread -Wall -Wextra \
    -o innr_tpu/_native_lib/libinnr_host.so native/innr_host.c
echo "built innr_tpu/_native_lib/libinnr_host.so"
