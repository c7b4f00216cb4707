/* Pure-C consumer of libjfquery (the linkable query library).
 *
 * Build (after `make -C jellyfish_tpu/native install PREFIX=...`):
 *   cc examples/query_client.c -o query_client \
 *      $(pkg-config --cflags --libs jfquery)
 * or against an in-tree build:
 *   make -C jellyfish_tpu/native
 *   cc -I jellyfish_tpu/native examples/query_client.c -o query_client \
 *      -L jellyfish_tpu/native -ljfquery -Wl,-rpath,'$ORIGIN'
 *
 * Usage: query_client counts.jf MER [MER...]
 *        query_client counts.jf --dump     (print every record)
 */

#include <stdint.h>
#include <stdio.h>
#include <string.h>

#include "jfquery.h"

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s db.jf MER [MER...] | --dump\n", argv[0]);
    return 2;
  }
  jf_query_t* q = jf_query_open(argv[1]);
  if (!q) {
    fprintf(stderr, "error: %s\n", jf_query_error());
    return 1;
  }
  if (!strcmp(argv[2], "--dump")) {
    char mer[128];
    uint64_t count, n = jf_query_nb_records(q);
    for (uint64_t i = 0; i < n; ++i) {
      if (!jf_query_record(q, i, mer, &count)) break;
      printf("%s %llu\n", mer, (unsigned long long)count);
    }
  } else {
    for (int i = 2; i < argc; ++i) {
      int64_t c = jf_query_mer(q, argv[i]);
      if (c < 0)
        fprintf(stderr, "invalid mer '%s' (k=%u)\n", argv[i], jf_query_k(q));
      else
        printf("%s %lld\n", argv[i], (long long)c);
    }
  }
  jf_query_close(q);
  return 0;
}
