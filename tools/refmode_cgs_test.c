// Test driver: refmode POA with caller-supplied CIGARs (push_bspoacore).
#include "filereader.h"
#include "bsalign.h"
#include "bspoa.h"

int main(int argc, char **argv) {
    // input: fasta where record 0 = backbone ref, others = reads;
    // cigars computed here via striped_seqedit_pairwise read-vs-ref
    FileReader *fr;
    BioSequence *seq;
    BSPOAPar par;
    BSPOA *g;
    u1v *ref = NULL;
    int first = 1;
    par = DEFAULT_BSPOA_PAR;
    par.refmode = 1;
    g = init_bspoa(par);
    beg_bspoa(g);
    fr = open_filereader(argv[1], 0);
    seq = init_biosequence();
    b1v *mempool = adv_init_b1v(1024, 0, WORDSIZE, 0);
    u4v *cigars = init_u4v(64);
    u1v *qcodes = init_u1v(64);
    while (readseq_filereader(fr, seq)) {
        if (first) {
            first = 0;
            ref = init_u1v(seq->seq->size);
            for (u4i i = 0; i < seq->seq->size; i++)
                push_u1v(ref, base_bit_table[(int)seq->seq->string[i]] & 3);
            push_bspoa(g, seq->seq->string, seq->seq->size);
        } else {
            clear_u1v(qcodes);
            for (u4i i = 0; i < seq->seq->size; i++)
                push_u1v(qcodes, base_bit_table[(int)seq->seq->string[i]] & 3);
            clear_u4v(cigars);
            striped_seqedit_pairwise(qcodes->buffer, qcodes->size,
                                     ref->buffer, ref->size,
                                     SEQALIGN_MODE_GLOBAL, 0, mempool,
                                     cigars, 0);
            push_bspoacore(g, seq->seq->string, seq->seq->size,
                           cigars->buffer, cigars->size);
        }
    }
    end_bspoa(g);
    tidy_msa_bspoa(g);
    call_snvs_bspoa(g);
    print_msa_bspoa(g, "TEST", 0, 0xFFFFFFFFU, 100, 0, stdout);
    print_snvs_bspoa(g, "TEST", stdout);
    return 0;
}
