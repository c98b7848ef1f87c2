"""Host-orchestrated SLAM pipelines (tracking / local mapping / loop closing).

The reference runs these as three std::threads + mutexes
(`System.cc:138-177`); here each is host Python sequencing jitted device
programs over the SoA map state — ordering is explicit, state is
versioned, no locks (SURVEY.md §2.3)."""
