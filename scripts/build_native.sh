#!/bin/sh
# Build the native host runtime (native/innr_host.c) into
# innr_tpu/_native_lib/libinnr_host.so. Pure C99, no dependencies.
set -e
cd "$(dirname "$0")/.."
mkdir -p innr_tpu/_native_lib
CC="${CC:-cc}"
$CC -O3 -std=c99 -shared -fPIC -pthread -Wall -Wextra \
    -o innr_tpu/_native_lib/libinnr_host.so native/innr_host.c
echo "built innr_tpu/_native_lib/libinnr_host.so"
