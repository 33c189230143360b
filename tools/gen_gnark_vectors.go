// gen_gnark_vectors: emit byte-level conformance vectors from a REAL
// gnark v0.8.0 / gnark-crypto v0.9.1 build, in the frozen v1 format
// consumed by tests/test_gnark_vectors.py (see
// tests/fixtures/gnark/README.md).
//
// This tool cannot be built in the repo's own development environment
// (no Go toolchain, no network). Build it anywhere with Go 1.20+ and a
// checkout of the reference repo (lambdaclass/noir_backend_using_gnark),
// whose gnark_backend_ffi module provides the ACIR parser and the
// ACIR->SparseR1CS lowering this tool reuses verbatim:
//
//	mkdir vecgen && cd vecgen
//	cp <this repo>/tools/gen_gnark_vectors.go .
//	go mod init vecgen
//	go mod edit -replace gnark_backend_ffi=<reference>/gnark_backend_ffi
//	go mod edit -require gnark_backend_ffi@v0.0.0
//	go get github.com/consensys/gnark@v0.8.0 \
//	       github.com/consensys/gnark-crypto@v0.9.1
//	go mod tidy
//	go run gen_gnark_vectors.go -out <this repo>/tests/fixtures/gnark
//
// Output files: felts.json, srs.json, vk_<circuit>.json,
// proof_<circuit>.json, provenance.json. Deterministic SRS: the KZG
// alpha is a fixed known scalar (vectors are test artifacts, not a
// production ceremony). gnark's prover blinds with crypto/rand, so
// proof bytes differ run to run — the proof vectors are for
// CROSS-verification (our verifier must accept them), not byte
// comparison.
package main

import (
	"encoding/hex"
	"encoding/json"
	"flag"
	"fmt"
	"log"
	"math/big"
	"os"
	"path/filepath"
	"strings"

	"gnark_backend_ffi/acir"
	"gnark_backend_ffi/backend"
	plonk_backend "gnark_backend_ffi/backend/plonk"

	"github.com/consensys/gnark-crypto/ecc"
	fr_bn254 "github.com/consensys/gnark-crypto/ecc/bn254/fr"
	"github.com/consensys/gnark-crypto/ecc/bn254/fr/kzg"
	"github.com/consensys/gnark/backend/plonk"
)

// Fixed toxic waste for reproducible SRS vectors.
const srsAlphaDec = "123456789123456789123456789"

// r - 1 (the BN254 Fr modulus minus one), used as -1 in the solved
// witness vectors below.
const rMinus1 = "21888242871839275222246405745257275088548364400416034343698204186575808495616"

// The three ACIR fixtures (this repo's tests/fixtures/acir_*.json ==
// the reference's inline main.go:233-246 circuits). The ACIR JSON is
// read from the fixtures directory (-fixtures flag) to avoid
// transcription drift; the values are the solved dense 1-based
// witness vectors (tests/test_plonk.py initial witnesses run through
// the pwg: x_neq_y with {1:0, 2:1}, x_eq_y_pub with {1:2, 2:2},
// priv_eq with {1:3, 2:3}).
var circuits = []struct {
	name   string
	file   string
	values []string // decimal, dense 1-based order (missing -> 0)
	public []string // decimal public inputs, PublicInputs order
}{
	{
		name:   "x_neq_y",
		file:   "acir_x_neq_y.json",
		values: []string{"0", "1", rMinus1, rMinus1, "1", "0"},
		public: []string{"1"},
	},
	{
		name:   "x_eq_y_pub",
		file:   "acir_x_eq_y_pub.json",
		values: []string{"2", "2", "0", "0", "0", "0"},
		public: []string{"2"},
	},
	{
		name:   "priv_eq",
		file:   "acir_priv_eq.json",
		values: []string{"3", "3", "0", "0", "0", "0"},
		public: []string{},
	},
}

func frFromDec(s string) fr_bn254.Element {
	var e fr_bn254.Element
	bi, ok := new(big.Int).SetString(s, 10)
	if !ok {
		log.Fatalf("bad decimal %q", s)
	}
	e.SetBigInt(bi)
	return e
}

func writeJSON(dir, name string, v any) {
	data, err := json.MarshalIndent(v, "", "  ")
	if err != nil {
		log.Fatal(err)
	}
	path := filepath.Join(dir, name)
	if err := os.WriteFile(path, data, 0o644); err != nil {
		log.Fatal(err)
	}
	fmt.Println("wrote", path)
}

func genFelts(dir string) {
	type vec struct {
		Value string `json:"value"`
		BeHex string `json:"be_hex"`
	}
	cases := []string{
		"0", "1", "2",
		"21888242871839275222246405745257275088548364400416034343698204186575808495616", // r-1
		"12345678901234567890123456789012345678901234567890",
	}
	out := struct {
		Format  int   `json:"format"`
		Vectors []vec `json:"vectors"`
	}{Format: 1}
	for _, c := range cases {
		e := frFromDec(c)
		b := e.Marshal()
		out.Vectors = append(out.Vectors, vec{Value: c, BeHex: hex.EncodeToString(b)})
	}
	writeJSON(dir, "felts.json", out)
}

func newSRS(size uint64) *kzg.SRS {
	alpha, _ := new(big.Int).SetString(srsAlphaDec, 10)
	srs, err := kzg.NewSRS(size, alpha)
	if err != nil {
		log.Fatal(err)
	}
	return srs
}

func srsHex(srs *kzg.SRS) string {
	var sb strings.Builder
	if _, err := srs.WriteTo(hex.NewEncoder(&sb)); err != nil {
		log.Fatal(err)
	}
	return sb.String()
}

func genSRS(dir string) {
	const size = 64
	srs := newSRS(size)
	out := struct {
		Format int    `json:"format"`
		Size   int    `json:"size"`
		Alpha  string `json:"alpha"`
		SrsHex string `json:"srs_hex"`
	}{Format: 1, Size: size, Alpha: srsAlphaDec, SrsHex: srsHex(srs)}
	writeJSON(dir, "srs.json", out)
}

func genCircuitVectors(dir, fixtures string) {
	for _, c := range circuits {
		raw, err := os.ReadFile(filepath.Join(fixtures, c.file))
		if err != nil {
			log.Fatal(err)
		}
		var circ acir.ACIR
		if err := json.Unmarshal(raw, &circ); err != nil {
			log.Fatal(err)
		}
		values := make(fr_bn254.Vector, len(c.values))
		for i, v := range c.values {
			values[i] = frFromDec(v)
		}

		// Reference lowering (sparse_r1cs.go:18-25) + witness build.
		cs, pubVars, secVars := plonk_backend.BuildSparseR1CS(circ, values)
		w := backend.BuildWitnesses(
			ecc.BN254.ScalarField(), pubVars, secVars,
			cs.GetNbPublicVariables(), cs.GetNbSecretVariables(),
		)

		// Deterministic SRS sized for the padded domain (+3 for the
		// blinding degree, like gnark's plonk.Setup requirement).
		n := uint64(cs.GetNbConstraints() + cs.GetNbPublicVariables())
		size := uint64(8)
		for size < n {
			size *= 2
		}
		srs := newSRS(size + 3)

		pk, vk, err := plonk.Setup(cs, srs)
		if err != nil {
			log.Fatal(err)
		}
		proof, err := plonk.Prove(cs, pk, w)
		if err != nil {
			log.Fatal(err)
		}
		pubW, err := w.Public()
		if err != nil {
			log.Fatal(err)
		}
		if err := plonk.Verify(proof, vk, pubW); err != nil {
			log.Fatal("self-verify failed: ", err)
		}

		var vkHex, proofHex strings.Builder
		if _, err := vk.WriteTo(hex.NewEncoder(&vkHex)); err != nil {
			log.Fatal(err)
		}
		if _, err := proof.WriteTo(hex.NewEncoder(&proofHex)); err != nil {
			log.Fatal(err)
		}

		var acirObj any
		_ = json.Unmarshal(raw, &acirObj)
		srsMeta := map[string]any{"size": size + 3, "alpha": srsAlphaDec}

		writeJSON(dir, "vk_"+c.name+".json", map[string]any{
			"format": 1, "circuit": c.name, "acir": acirObj,
			"srs": srsMeta, "vk_hex": vkHex.String(),
		})
		writeJSON(dir, "proof_"+c.name+".json", map[string]any{
			"format": 1, "circuit": c.name, "acir": acirObj,
			"values": c.values, "public_inputs": c.public,
			"srs": srsMeta, "vk_hex": vkHex.String(),
			"proof_hex": proofHex.String(),
		})
	}
}

func main() {
	out := flag.String("out", ".", "output directory")
	fixtures := flag.String("fixtures", "tests/fixtures", "directory holding acir_*.json")
	flag.Parse()
	if err := os.MkdirAll(*out, 0o755); err != nil {
		log.Fatal(err)
	}
	genFelts(*out)
	genSRS(*out)
	genCircuitVectors(*out, *fixtures)
	writeJSON(*out, "provenance.json", map[string]any{
		"generator":    "tools/gen_gnark_vectors.go",
		"gnark":        "v0.8.0",
		"gnark_crypto": "v0.9.1",
	})
}
