/* Oracle driver: run the reference fsk_mod_c over bits from stdin and write
 * interleaved float32 IQ to stdout.  Usage: fsk_mod_driver Fs Rs P f1 shift
 * (our own test harness code; links against the read-only reference src). */
#include <stdio.h>
#include <stdlib.h>
#include "fsk.h"

int main(int argc, char **argv) {
    if (argc != 6) { fprintf(stderr, "args: Fs Rs P f1 shift\n"); return 1; }
    int Fs = atoi(argv[1]), Rs = atoi(argv[2]), P = atoi(argv[3]);
    int f1 = atoi(argv[4]), shift = atoi(argv[5]);
    struct FSK *fsk = fsk_create_hbr(Fs, Rs, P, 2, f1, shift);
    if (!fsk) return 2;
    int nbits = fsk->Nbits;
    uint8_t *bits = malloc(nbits);
    COMP *out = malloc(sizeof(COMP) * fsk->N);
    size_t r;
    while ((r = fread(bits, 1, nbits, stdin)) == (size_t)nbits) {
        fsk_mod_c(fsk, out, bits);
        fwrite(out, sizeof(COMP), fsk->N, stdout);
    }
    return 0;
}
