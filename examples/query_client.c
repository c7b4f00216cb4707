/* Pure-C consumer of libjfquery (the linkable query library).
 *
 * Build:
 *   g++ -O2 -std=c++17 -shared -fPIC jellyfish_tpu/native/jfquery.cpp \
 *       -o libjfquery.so
 *   cc examples/query_client.c -o query_client -L. -ljfquery \
 *      -Wl,-rpath,'$ORIGIN'
 *
 * Usage: query_client counts.jf MER [MER...]
 *        query_client counts.jf --dump     (print every record)
 */

#include <stdint.h>
#include <stdio.h>
#include <string.h>

/* C ABI of jellyfish_tpu/native/jfquery.cpp */
typedef struct jf_query_t jf_query_t;
jf_query_t* jf_query_open(const char* path);
void jf_query_close(jf_query_t* q);
const char* jf_query_error(void);
unsigned jf_query_k(const jf_query_t* q);
int jf_query_canonical(const jf_query_t* q);
uint64_t jf_query_nb_records(const jf_query_t* q);
int64_t jf_query_mer(jf_query_t* q, const char* mer);
int jf_query_record(jf_query_t* q, uint64_t idx, char* mer_out,
                    uint64_t* count);

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
