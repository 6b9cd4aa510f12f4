/* Harness for the reference's third public build API,
 * build_tree_from_tokens (include/tree_builder.h:8): tokenize a file
 * standalone (no tree-builder feedback — allow_cdata stays 0, the
 * tokenizer's own raw-state self-switching still applies), collect
 * the full token array, feed it to build_tree_from_tokens, and dump
 * the resulting tree. Used by tests/test_tokens_build.py to mint
 * goldens for the repo's build_document_from_tokens parity port.
 * Compiled out-of-tree against /tmp/refbuild (the reference copy the
 * test conftest already builds); this file is original harness code,
 * not reference source. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "tree_builder.h"
#include "tokenizer.h"
#include "encoding.h"

static size_t read_file_raw(const char *path, char **out_buf) {
    FILE *fp = fopen(path, "rb");
    if (!fp) return 0;
    fseek(fp, 0, SEEK_END);
    long len = ftell(fp);
    fseek(fp, 0, SEEK_SET);
    if (len < 0) { fclose(fp); return 0; }
    char *buf = (char *)malloc((size_t)len + 1);
    if (!buf) { fclose(fp); return 0; }
    size_t read_len = fread(buf, 1, (size_t)len, fp);
    fclose(fp);
    buf[read_len] = '\0';
    *out_buf = buf;
    return read_len;
}

int main(int argc, char **argv) {
    const char *path = (argc > 1) ? argv[1] : "tests/sample.html";
    char *raw = NULL;
    size_t raw_len = read_file_raw(path, &raw);
    if (!raw) {
        fprintf(stderr, "failed to read %s\n", path);
        return 1;
    }
    encoding_result enc = encoding_sniff_and_convert(
        (const unsigned char *)raw, raw_len, NULL);
    free(raw);
    if (!enc.data) {
        fprintf(stderr, "encoding conversion failed for %s\n", path);
        return 1;
    }
    char *input = tokenizer_replace_nulls(enc.data, enc.len);
    free(enc.data);

    tokenizer tz;
    tokenizer_init(&tz, input);
    size_t cap = 64, count = 0;
    token *tokens = (token *)malloc(cap * sizeof(token));
    if (!tokens) {
        fprintf(stderr, "token buffer allocation failed\n");
        free(input);
        return 1;
    }
    for (;;) {
        if (count == cap) {
            cap *= 2;
            token *grown = (token *)realloc(tokens, cap * sizeof(token));
            if (!grown) {
                fprintf(stderr, "token buffer growth failed\n");
                size_t j;
                for (j = 0; j < count; ++j) token_free(&tokens[j]);
                free(tokens);
                free(input);
                return 1;
            }
            tokens = grown;
        }
        token_init(&tokens[count]);
        tokenizer_next(&tz, &tokens[count]);
        if (tokens[count].type == TOKEN_EOF) { count++; break; }
        count++;
    }

    node *doc = build_tree_from_tokens(tokens, count);
    if (doc) tree_dump_ascii(doc, path);
    size_t i;
    for (i = 0; i < count; ++i) token_free(&tokens[i]);
    free(tokens);
    free(input);
    return doc ? 0 : 1;
}
