#!/bin/sh
# Golden pre-integration runs (ref: devel/pre-int_test.sh)
cd "$(dirname "$0")" && exec python integration_test.py "$@"
